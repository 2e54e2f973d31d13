"""End-to-end CLI integration on CPU with the micro config (subprocess)."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

# subprocess CLI drives (compiles per process) -- slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_train_plain_base_micro(tmp_path):
    """Plain (non-curriculum) LiDARGen training path end-to-end: BaseTrainer
    dispatched via training.algo, EMA test loss at step 100, snapshot_freq
    checkpoint, rolling ckpt (reference runners/ncsn_runner.py:42-221)."""
    env = dict(os.environ)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['main.py','--ni','--config','micro_base.yml',"
        f"'--exp',{str(tmp_path)!r},'--doc','t'];"
        "import runpy; runpy.run_path('main.py', run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=580,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    log = os.path.join(tmp_path, "logs", "t")
    assert os.path.isdir(os.path.join(log, "ckpt_100")), os.listdir(log)
    assert os.path.isdir(os.path.join(log, "ckpt_110"))
    assert os.path.isdir(os.path.join(log, "ckpt"))
    metrics = open(os.path.join(log, "metrics.jsonl")).read()
    assert '"test_loss"' in metrics and '"loss"' in metrics


def test_cli_train_3d_micro(tmp_path):
    """3D-noise shared-cloud curriculum end-to-end via the CLI
    (training.algo: simultaneous_3d)."""
    env = dict(os.environ)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['main.py','--ni','--config','micro_3d.yml',"
        f"'--exp',{str(tmp_path)!r},'--doc','t'];"
        "import runpy; runpy.run_path('main.py', run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=580,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    log = os.path.join(tmp_path, "logs", "t")
    assert os.path.isdir(os.path.join(log, "ckpt"))
    metrics = os.path.join(log, "metrics.jsonl")
    stdout = open(os.path.join(log, "stdout.txt")).read()
    assert "loss" in stdout


def test_trainer_dispatch():
    from simultaneous_diffusion_for_pointclouds_tpu.runners import (
        BaseTrainer,
        CurriculumTrainer,
        trainer_for,
    )
    import argparse
    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace

    args = argparse.Namespace(seed=0)
    cfg = dict2namespace(yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml"))))
    assert type(trainer_for(args, cfg)) is CurriculumTrainer
    cfg.data.dataset = "KITTI"  # plain LiDARGen dataset -> base loop
    assert type(trainer_for(args, cfg)) is BaseTrainer
    cfg.data.dataset = "synthetic"
    cfg.training.algo = "base"  # explicit override
    assert type(trainer_for(args, cfg)) is BaseTrainer


def test_hyperparameter_grid_single_jit(tmp_path):
    """All six (correlation, gradRef) grid variants run through ONE cached
    jit — the scalars are traced arguments, not retrace triggers
    (reference ncsn_runner_basic_simultaneous.py:495-565)."""
    import argparse

    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    cfg = dict2namespace(
        yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml")))
    )
    args = argparse.Namespace(seed=0, image_folder=str(tmp_path))
    runner = SimultaneousSamplingRunner(args, cfg, variant="offsets")
    assert runner._jit_grid(runner.views) is runner._jit_grid(runner.views)
    results = runner.hyperparameter_grid_sample(max_batches=1)
    assert len(results) == len(runner.GRID_VARIANTS)
    for out in results.values():
        assert np.isfinite(out).all()
    outs = glob.glob(os.path.join(tmp_path, "grid*_completion.npy"))
    assert len(outs) == len(runner.GRID_VARIANTS)


def test_cli_sample_micro(tmp_path):
    env = dict(os.environ)
    # main.py runs on the default backend; force CPU inside the subprocess
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['main.py','--sample','--ni','--config','micro.yml',"
        f"'--exp',{str(tmp_path)!r},'--doc','t','--max_batches','1'];"
        "import runpy; runpy.run_path('main.py', run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=580,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    outs = glob.glob(os.path.join(tmp_path, "image_samples", "images", "*Masked_completion*.npy"))
    assert outs, "no completion outputs written"
    arr = np.load(outs[0])
    assert arr.ndim == 4 and arr.shape[1] == 3
    assert np.isfinite(arr).all()


def test_hyperparameter_grid_exec_chunks_identical(tmp_path):
    """Chunked grid ladder (traced corr/grad_ref scalars through carried
    segments + a traced-grad_ref finalizer) == single execution."""
    import argparse

    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    results = {}
    for chunks in (1, 3):
        raw = yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml")))
        raw["sampling"]["exec_level_chunks"] = chunks
        cfg = dict2namespace(raw)
        args = argparse.Namespace(seed=0, image_folder=str(tmp_path / str(chunks)))
        runner = SimultaneousSamplingRunner(args, cfg, variant="offsets")
        results[chunks] = runner.hyperparameter_grid_sample(max_batches=1)
    for key, out in results[1].items():
        np.testing.assert_array_equal(out, results[3][key])


def test_cli_fast_fid_metrics(tmp_path):
    """--fast_fid samples, saves fid_*.npy, and emits fid_metrics.json with
    JSD + MMD^2 vs the test set (VERDICT r3 #4; the reference's dispatch is
    an AttributeError, main.py:202-203)."""
    import json

    env = dict(os.environ)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['main.py','--fast_fid','--ni','--config','micro.yml',"
        f"'--exp',{str(tmp_path)!r},'--doc','t','-i','f'];"
        "import runpy; runpy.run_path('main.py', run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=580,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    folder = os.path.join(tmp_path, "fid_samples", "f")
    fids = glob.glob(os.path.join(folder, "fid_*.npy"))
    assert len(fids) >= 8, os.listdir(folder)
    metrics = json.load(open(os.path.join(folder, "fid_metrics.json")))
    assert np.isfinite(metrics["jsd"]) and np.isfinite(metrics["mmd2"])
    assert metrics["n_samples"] >= 8 and metrics["n_reference"] >= 1
