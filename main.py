#!/usr/bin/env python
"""CLI entry point, drop-in compatible with the reference's ``main.py``.

``python main.py --sample --ni --config Line.yml`` etc. (reference
LiDARGen/main.py:17-36 for the flag set).  Dataset name selects the runner
exactly as the reference dispatch does (main.py:191-195):
``KITTI360_im_8batch`` -> the pose-matrix simultaneous runner; everything
else -> the offset-origin (AllForOne/Completion) runner.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
import traceback

import numpy as np


def parse_args_and_config():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default="Line.yml", help="Path to the config file")
    parser.add_argument("--seed", type=int, default=1234, help="Random seed")
    parser.add_argument("--exp", type=str, default="exp", help="Path for saving running related data.")
    parser.add_argument("--doc", type=str, default="default", help="Name of the log folder.")
    parser.add_argument("--comment", type=str, default="", help="Experiment comment")
    parser.add_argument("--verbose", type=str, default="info", help="info | debug | warning | critical")
    parser.add_argument("--test", action="store_true", help="Test the model")
    parser.add_argument("--sample", action="store_true", help="Produce samples from the model")
    parser.add_argument("--densification", action="store_true", default=False)
    parser.add_argument("--nvs", action="store_true", help="Novel view synthesis")
    parser.add_argument("--fast_fid", action="store_true", help="Fast FID test")
    parser.add_argument("--resume_training", action="store_true")
    parser.add_argument("-i", "--image_folder", type=str, default="images")
    parser.add_argument("--ni", action="store_true", help="No interaction (batch jobs)")
    parser.add_argument(
        "--keep_image_folder", action="store_true",
        help="Reuse an existing image folder in place (resume an interrupted "
        "ablation with sampling.plan_start) instead of overwriting it",
    )
    parser.add_argument("--ckpt", type=str, default=None, help="Checkpoint path override")
    parser.add_argument("--max_batches", type=int, default=None, help="Limit sampling batches")
    parser.add_argument("--max_steps", type=int, default=None, help="Limit training steps")
    args = parser.parse_args()

    from simultaneous_diffusion_for_pointclouds_tpu.config import load_config, save_config
    from simultaneous_diffusion_for_pointclouds_tpu.utils.logging_utils import setup_logging

    args.log_path = os.path.join(args.exp, "logs", args.doc)
    cfg_path = args.config
    if not os.path.isfile(cfg_path):
        cfg_path = os.path.join(os.path.dirname(__file__), "configs", args.config)
    config = load_config(cfg_path, densification=args.densification)

    if not (args.test or args.sample or args.nvs or args.fast_fid):
        if not args.resume_training and os.path.exists(args.log_path):
            overwrite = args.ni or input("Folder already exists. Overwrite? (Y/N)").upper() == "Y"
            if overwrite:
                shutil.rmtree(args.log_path)
            else:
                print("Folder exists. Program halted.")
                sys.exit(0)
        os.makedirs(args.log_path, exist_ok=True)
        save_config(config, os.path.join(args.log_path, "config.yml"))
        setup_logging(args.log_path, args.verbose)
    else:
        setup_logging(None, args.verbose)
        if args.sample or args.fast_fid:
            sub = "image_samples" if args.sample else "fid_samples"
            args.image_folder = os.path.join(args.exp, sub, args.image_folder)
            if os.path.exists(args.image_folder) and not args.keep_image_folder:
                overwrite = args.ni or input("Image folder exists. Overwrite? (Y/N)").upper() == "Y"
                if overwrite:
                    shutil.rmtree(args.image_folder)
                else:
                    print("Output image folder exists. Program halted.")
                    sys.exit(0)
            os.makedirs(args.image_folder, exist_ok=True)

    np.random.seed(args.seed)
    return args, config


def main():
    args, config = parse_args_and_config()
    logging.info("Writing log file to %s", args.log_path)
    logging.info("Exp instance id = %d", os.getpid())

    from simultaneous_diffusion_for_pointclouds_tpu.config import cfg_get
    from simultaneous_diffusion_for_pointclouds_tpu.runners import (
        PLAIN_DATASETS,
        SimultaneousSamplingRunner,
        trainer_for,
    )

    dataset = cfg_get(config, "data.dataset")
    variant = "poses" if dataset in ("KITTI360_im_8batch", "synthetic") else "offsets"

    try:
        if args.sample:
            runner = SimultaneousSamplingRunner(args, config, variant=variant)
            # plain single-view datasets take the reference base runner's
            # unconditional branch (ncsn_runner.py:505-533), incl. the
            # final_only: false per-level trajectory dumps
            if (
                dataset in PLAIN_DATASETS
                or cfg_get(config, "sampling.method", "basic") == "plain"
            ):
                runner.plain_sample(ckpt_path=args.ckpt)
            else:
                runner.sample(max_batches=args.max_batches, ckpt_path=args.ckpt)
        elif args.fast_fid:
            runner = SimultaneousSamplingRunner(args, config, variant=variant)
            runner.fast_fid(ckpt_path=args.ckpt)
        elif args.test:
            trainer_for(args, config).test()
        elif args.nvs:
            runner = SimultaneousSamplingRunner(args, config, variant=variant)
            runner.sample(max_batches=args.max_batches, ckpt_path=args.ckpt)
        else:
            trainer_for(args, config).train(max_steps=args.max_steps)
    except Exception:
        logging.error(traceback.format_exc())
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
