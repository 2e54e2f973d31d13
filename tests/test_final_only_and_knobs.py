"""final_only trajectory dumps + step movies (VERDICT r2 #6) and the
memory knobs sequential_groups / score_chunks (VERDICT r2 #8)."""

import argparse
import glob
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(**sampling_overrides):
    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace

    raw = yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml")))
    raw["sampling"].update(sampling_overrides)
    raw["parallel"] = {"enable": False}
    return dict2namespace(raw)


def test_plain_sample_final_only_false_writes_levels(tmp_path):
    """plain_sample with final_only: false saves samples_{i}.pth.npy per
    noise level plus the denoised final, and image_grid_{i}.png
    (reference ncsn_runner.py:505-516)."""
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    cfg = _cfg(final_only=False, batch_size=4)
    args = argparse.Namespace(seed=0, image_folder=str(tmp_path))
    runner = SimultaneousSamplingRunner(args, cfg, variant="offsets")
    n = runner.plain_sample()
    levels = cfg.model.num_classes
    assert n == levels + 1  # per-level + denoised final
    files = sorted(glob.glob(os.path.join(tmp_path, "samples_*.pth.npy")))
    assert len(files) == levels + 1
    grids = glob.glob(os.path.join(tmp_path, "image_grid_*.png"))
    assert len(grids) == levels + 1
    for f in files:
        arr = np.load(f)
        assert arr.shape[0] == 4 and np.isfinite(arr).all()


def test_plain_sample_final_only_true(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    cfg = _cfg(final_only=True, batch_size=4)
    args = argparse.Namespace(seed=0, image_folder=str(tmp_path))
    runner = SimultaneousSamplingRunner(args, cfg, variant="offsets")
    runner.plain_sample()
    assert os.path.isfile(os.path.join(tmp_path, "samples.pth.npy"))
    assert os.path.isfile(os.path.join(tmp_path, "image_grid.png"))
    assert not glob.glob(os.path.join(tmp_path, "samples_*.pth.npy"))


def test_simultaneous_sample_trajectory_dumps(tmp_path):
    """The ablation runner honors final_only: false too: per-variant
    per-level samples_{lvl} dumps alongside the Masked_completion output."""
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    cfg = _cfg(final_only=False)
    args = argparse.Namespace(seed=0, image_folder=str(tmp_path))
    runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
    runner.sample(max_batches=1)
    levels = cfg.model.num_classes
    per_level = glob.glob(os.path.join(tmp_path, "0_*_samples_*.pth.npy"))
    assert len(per_level) == levels + 1, sorted(os.listdir(tmp_path))[:10]


def test_step_movie_renders_frames(tmp_path):
    """render_step_movie consumes the per-level dumps and writes BEV +
    perspective frames (+ MP4s when ffmpeg exists) — reference
    visualization.py:67-109."""
    from simultaneous_diffusion_for_pointclouds_tpu.eval.visualization import (
        render_step_movie,
    )

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(img_dir / f"samples_{i}.pth", rng.uniform(0, 1, (2, 2, 8, 16)).astype(np.float32))
    out = render_step_movie(str(img_dir), str(tmp_path / "movie"), max_samples=1)
    assert out["frames"], "no frames rendered"
    # 3 levels + final held for max(3//4,1)=1 extra frame
    assert len(out["frames"][0]) == 4
    for f in out["frames"][0]:
        assert os.path.isfile(f)


def test_memory_knobs_identical_results():
    """sequential_groups + score_chunks give bit-comparable samples to the
    default full-batch path (they only re-tile the computation)."""
    import jax
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    outs = {}
    for name, over in (
        ("plain", {}),
        ("chunked", dict(sequential_groups=True, score_chunks=2)),
    ):
        cfg = _cfg(batch_size=8, **over)
        runner = SimultaneousSamplingRunner(
            argparse.Namespace(seed=0, image_folder="/tmp/unused"), cfg,
            variant="poses",
        )
        assert runner.sequential_groups == bool(over)
        assert runner.score_chunks == over.get("score_chunks", 1)
        b, c, h, w = 8, 2, runner.rows, runner.cols
        rng = jax.random.PRNGKey(3)
        x = jax.random.uniform(rng, (b, c, h, w), jnp.float32)
        refer = jax.random.uniform(jax.random.PRNGKey(4), (b, c, h, w), jnp.float32)
        mask = (jax.random.uniform(jax.random.PRNGKey(5), (b, c, h, w)) > 0.5).astype(
            jnp.float32
        )
        sky = jnp.ones((b, 1, h, w), jnp.float32)
        exist = jnp.ones((b, h, w), jnp.float32)
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
        origins = jnp.zeros((2, 3), jnp.float32)
        params = runner.load_params(rng=jax.random.PRNGKey(0))
        outs[name] = np.asarray(
            runner._jit_simultaneous(2)(
                params, rng, x, refer, mask, sky, exist, eye, eye, origins
            )
        )
    diff = np.abs(outs["plain"] - outs["chunked"])
    assert float(np.mean(diff <= 1e-5)) > 0.999, float(diff.max())
