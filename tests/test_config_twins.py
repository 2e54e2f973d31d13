"""The four remaining reference config twins (VERDICT r4 #9): lidar.yml,
ncsn_original.yml, kitti_densify.yml, kitti_local.yml — config loading,
dataset/model/trainer dispatch, the single-image "lidar" dataset against
the reference oracle, the CIFAR-10 pickle loader, and (slow tier) CLI
drives of the CIFAR10/NCSNv2 and lidar paths end to end.
"""

import argparse
import os
import pickle
import subprocess
import sys
import types

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/LiDARGen"

from simultaneous_diffusion_for_pointclouds_tpu.config import (
    cfg_get,
    dict2namespace,
    load_config,
)


def _load(name):
    return load_config(os.path.join(REPO, "configs", name))


def _write_cifar_batches(root, n_per_batch=8, seed=0):
    """Fabricate "CIFAR-10 python version" pickle batches."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, (n_per_batch, 3072), dtype=np.uint8)
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * n_per_batch}, f)


# ---------------------------------------------------------------------------
# fast tier: config twins load + dispatch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,dataset,model_cls,trainer_cls",
    [
        ("lidar.yml", "lidar", "NCSNLiDARSmall", "BaseTrainer"),
        ("ncsn_original.yml", "CIFAR10", "NCSNv2", "BaseTrainer"),
        ("kitti_densify.yml", "KITTI", "NCSNLiDARSmall", "BaseTrainer"),
        ("kitti_local.yml", "KITTI", "NCSNLiDARSmall", "BaseTrainer"),
    ],
)
def test_twin_loads_and_dispatches(name, dataset, model_cls, trainer_cls):
    import simultaneous_diffusion_for_pointclouds_tpu.models as models
    from simultaneous_diffusion_for_pointclouds_tpu.models import get_model
    from simultaneous_diffusion_for_pointclouds_tpu.runners import trainer_for

    cfg = _load(name)
    assert cfg_get(cfg, "data.dataset") == dataset
    assert type(get_model(cfg)).__name__ == type(
        getattr(models, model_cls)(cfg)
    ).__name__
    assert type(trainer_for(argparse.Namespace(seed=0), cfg)).__name__ == trainer_cls


@pytest.mark.parametrize(
    "ours,theirs",
    [
        ("lidar.yml", "lidar.yml"),
        ("ncsn_original.yml", "ncsn_original.yml"),
        ("kitti_densify.yml", "kitti_densify.yml"),
        ("kitti_local.yml", "kitti_local.yml"),
    ],
)
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference unavailable")
def test_twin_matches_reference_keys(ours, theirs):
    """Every reference key is present with the same value (our files may add
    keys like data.root; those are extensions, not divergences)."""
    ref = yaml.safe_load(open(os.path.join(REFERENCE, "configs", theirs)))
    mine = yaml.safe_load(open(os.path.join(REPO, "configs", ours)))
    for section, body in ref.items():
        assert section in mine, section
        for key, val in body.items():
            assert key in mine[section], f"{section}.{key}"
            got = mine[section][key]
            assert got == pytest.approx(val) if isinstance(val, float) else got == val, (
                f"{section}.{key}: {got!r} != {val!r}"
            )


def test_lidar_single_matches_reference_oracle(tmp_path):
    """Our LiDARSingle vs the reference datasets/lidar.py loaded read-only
    (same npy -> identical standardized tensor, same length)."""
    from simultaneous_diffusion_for_pointclouds_tpu.data.lidargen_original import (
        LiDARSingle,
    )

    h, w = 16, 32
    rng = np.random.default_rng(3)
    raw = rng.uniform(-1.0, 60.0, (h, w)).astype(np.float32)
    np.save(tmp_path / "0_200.npy", raw)

    cfg = dict2namespace(
        {"data": {"dataset": "lidar", "image_size": h, "image_width": w,
                  "channels": 1, "root": str(tmp_path)}}
    )
    ours = LiDARSingle(cfg, split="train")
    item = ours[0]
    assert len(ours) == 1000
    assert item["real"].shape == (1, h, w)

    if os.path.isdir(REFERENCE):
        import importlib.util

        pkg = types.ModuleType("_refds")
        pkg.__path__ = [os.path.join(REFERENCE, "datasets")]
        sys.modules["_refds"] = pkg
        spec = importlib.util.spec_from_file_location(
            "_refds.lidar", os.path.join(REFERENCE, "datasets", "lidar.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref = mod.LiDAR(path=str(tmp_path), config=cfg)
        ref_data, _ = ref[0]
        np.testing.assert_allclose(item["real"], ref_data, rtol=1e-5, atol=1e-6)
        assert len(ref) == len(ours)


def test_cifar10_loader(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.data.cifar10 import CIFAR10

    _write_cifar_batches(tmp_path / "cifar-10-batches-py")
    cfg = dict2namespace(
        {"data": {"dataset": "CIFAR10", "root": str(tmp_path),
                  "random_flip": True}}
    )
    train = CIFAR10(cfg, split="train")
    test = CIFAR10(cfg, split="test")
    assert len(train) == 40 and len(test) == 8
    it = train[0]
    assert it["real"].shape == (3, 32, 32)
    assert it["real"].dtype == np.float32
    assert 0.0 <= it["real"].min() and it["real"].max() <= 1.0
    assert (it["known"] == 1).all()
    # test split never flips
    a, b = test[0]["real"], test[0]["real"]
    np.testing.assert_array_equal(a, b)

    with pytest.raises(FileNotFoundError, match="CIFAR-10"):
        CIFAR10(
            dict2namespace({"data": {"root": str(tmp_path / "nope")}}),
            split="train",
        )


# ---------------------------------------------------------------------------
# slow tier: CLI drives
# ---------------------------------------------------------------------------


def _drive(tmp_path, cfg_dict, extra_argv):
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv=['main.py','--ni','--config',{str(cfg_path)!r},"
        f"'--exp',{str(tmp_path / 'exp')!r}] + {extra_argv!r};"
        "import runpy; runpy.run_path('main.py', run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=dict(os.environ),
        capture_output=True, text=True, timeout=580,
    )


def _micro(ds_body, model_extra=None, sampling_extra=None):
    cfg = {
        "training": {"batch_size": 4, "n_epochs": 100, "n_iters": 4,
                     "snapshot_freq": 2, "snapshot_sampling": False,
                     "anneal_power": 2.0, "log_all_sigmas": False},
        "sampling": {"batch_size": 4, "data_init": False, "step_lr": 2e-5,
                     "n_steps_each": 2, "ckpt_id": 0, "final_only": True,
                     "fid": False, "denoise": False, "num_samples4fid": 1,
                     "inpainting": False, "interpolation": False,
                     "method": "plain", **(sampling_extra or {})},
        "test": {"begin_ckpt": 0, "end_ckpt": 10, "batch_size": 4},
        "data": ds_body,
        "model": {"sigma_begin": 1, "sigma_end": 0.01, "sigma_dist": "geometric",
                  "num_classes": 3, "normalization": "InstanceNorm++",
                  "nonlinearity": "elu", "spec_norm": False, "ema": False,
                  "ema_rate": 0.999, "ngf": 8, **(model_extra or {})},
        "optim": {"weight_decay": 0.0, "optimizer": "Adam", "lr": 0.001,
                  "beta1": 0.9, "amsgrad": False, "eps": 1e-8},
    }
    return cfg


@pytest.mark.slow
def test_cli_cifar10_train_and_sample(tmp_path):
    """ncsn_original path at micro scale: CIFAR10 pickles -> BaseTrainer
    (uniform dequantization w/ rng) -> plain NCSNv2 sampling."""
    _write_cifar_batches(tmp_path / "data")
    ds = {"dataset": "CIFAR10", "root": str(tmp_path / "data"),
          "image_size": 32, "channels": 3, "logit_transform": False,
          "uniform_dequantization": True, "gaussian_dequantization": False,
          "random_flip": True, "rescaled": False, "num_workers": 2}
    cfg = _micro(ds)

    r = _drive(tmp_path, cfg, ["--doc", "t"])
    assert r.returncode == 0, r.stderr[-2000:]
    log = tmp_path / "exp" / "logs" / "t"
    assert (log / "ckpt").is_dir() and (log / "ckpt_2").is_dir()
    assert "ERROR" not in (log / "stdout.txt").read_text()

    r = _drive(tmp_path, cfg, ["--sample", "--doc", "t", "-i", "img",
                               "--ckpt", str(log / "ckpt")])
    assert r.returncode == 0, r.stderr[-2000:]
    import glob as globmod

    outs = globmod.glob(str(tmp_path / "exp" / "image_samples" / "img" / "*.npy"))
    assert outs, os.listdir(tmp_path / "exp" / "image_samples" / "img")
    arr = np.load(outs[0])
    assert arr.shape[-3:] == (3, 32, 32) and np.isfinite(arr).all()


@pytest.mark.slow
def test_cli_lidar_single_train(tmp_path):
    """lidar.yml path at micro scale: the single-image dataset read from
    <exp>/datasets/lidar, trained with the plain loop."""
    h, w = 16, 32
    lidar_dir = tmp_path / "exp" / "datasets" / "lidar"
    os.makedirs(lidar_dir)
    np.save(lidar_dir / "0_200.npy",
            np.random.default_rng(0).uniform(0, 60, (h, w)).astype(np.float32))
    ds = {"dataset": "lidar", "image_size": h, "image_width": w,
          "channels": 1, "logit_transform": False,
          "uniform_dequantization": False, "gaussian_dequantization": False,
          "random_flip": True, "random_roll": False, "rescaled": False,
          "num_workers": 2}
    cfg = _micro(ds)
    cfg["training"]["n_iters"] = 12  # loss logs every 10 steps
    cfg["training"]["snapshot_freq"] = 10

    r = _drive(tmp_path, cfg, ["--doc", "t"])
    assert r.returncode == 0, r.stderr[-2000:]
    log = tmp_path / "exp" / "logs" / "t"
    assert (log / "ckpt").is_dir()
    assert '"loss"' in (log / "metrics.jsonl").read_text()
