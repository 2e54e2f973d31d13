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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_segmented_ladder_bitwise_equal():
    """Chunked execution (start_level/carry_in/finalize=False segments +
    the finalizer tail) reproduces the single-execution sampler BITWISE:
    noise keys and the correlation schedule use absolute level indices."""
    import jax
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
        ConsistencyConfig,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import (
        LangevinConfig,
        simultaneous_inpainting_sample,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
        kitti_sampler_grid,
    )

    h, w, b = 8, 32, 4
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (b, 2, h, w), jnp.float32) * 0.4 + 0.05
    refer = jax.random.uniform(jax.random.PRNGKey(1), (b, 2, h, w), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (b, 2, h, w)) > 0.5).astype(
        jnp.float32
    )
    sky = jnp.ones((b, 1, h, w), jnp.float32)
    exist = jnp.ones((b, h, w), jnp.float32)
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    sigmas = jnp.geomspace(5.0, 0.05, 7).astype(jnp.float32)
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-5, denoise=True, noise_scale=1.0)
    ccfg = ConsistencyConfig(
        grid=kitti_sampler_grid(h, w), actual_batch_size=b, setting=6,
        variant="poses",
    )
    kw = dict(
        refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
        min_step_to_share=2, grad_ref=1.0, correlation_coefficient=0.01,
        to_world=eye, from_world=eye,
    )

    single = simultaneous_inpainting_sample(
        rng, x, lambda v, l: -0.1 * v, sigmas, cfg, ccfg, **kw
    )

    # 7 levels in segments of 3+3+1 (two distinct segment lengths)
    xs, gl, shared = x, jnp.zeros_like(x), jnp.zeros_like(x)
    for start, ln in ((0, 3), (3, 3), (6, 1)):
        xs, gl, shared = simultaneous_inpainting_sample(
            rng, xs, lambda v, l: -0.1 * v, sigmas[start : start + ln], cfg,
            ccfg, start_level=jnp.int32(start), total_levels=7,
            sigma_last=sigmas[-1], carry_in=(gl, shared), finalize=False, **kw
        )
    # finalizer tail (runners/sample.py:_make_finalizer)
    labels = jnp.full((b,), 6, jnp.int32)
    xs = xs + sigmas[-1] ** 2 * (-0.1 * xs) + 1.0 * gl
    xs = xs + 1.0 * (-mask * (xs - refer))

    np.testing.assert_array_equal(np.asarray(single), np.asarray(xs))


@pytest.mark.slow
def test_runner_exec_level_chunks_identical(tmp_path):
    """The runner's chunked ladder (exec_level_chunks > 1) produces
    bit-identical Masked_completion outputs to the single execution."""
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    outs = {}
    for chunks in (1, 3):
        d = tmp_path / f"c{chunks}"
        d.mkdir()
        cfg = _cfg(exec_level_chunks=chunks)
        args = argparse.Namespace(seed=0, image_folder=str(d))
        runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
        assert (runner._ladder_segments() is None) == (chunks == 1)
        runner.sample(max_batches=1, seed=7)
        (f,) = glob.glob(os.path.join(d, "0_*Masked_completion*.npy"))
        outs[chunks] = np.load(f)
    np.testing.assert_array_equal(outs[1], outs[3])


@pytest.mark.slow
def test_runner_second_method_exec_chunks_identical(tmp_path):
    """Chunked ladder for the second-method path (prelude + carried
    segments + finalizer, per-scene vmap with G=2) == single execution."""
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    outs = {}
    for chunks in (1, 3):
        d = tmp_path / f"c{chunks}"
        d.mkdir()
        cfg = _cfg(exec_level_chunks=chunks, method="second")
        args = argparse.Namespace(seed=0, image_folder=str(d))
        runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
        runner.sample(max_batches=1, seed=7)
        (f,) = glob.glob(os.path.join(d, "0_*Masked_completion*.npy"))
        outs[chunks] = np.load(f)
    np.testing.assert_array_equal(outs[1], outs[3])


@pytest.mark.slow
def test_plain_sample_exec_chunks_identical(tmp_path):
    """plain_sample chunked == single execution (incl. the per-level
    trajectory dumps concatenated across segments)."""
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    outs = {}
    for chunks in (1, 2):
        d = tmp_path / f"c{chunks}"
        d.mkdir()
        cfg = _cfg(exec_level_chunks=chunks, batch_size=4, final_only=False)
        args = argparse.Namespace(seed=0, image_folder=str(d))
        runner = SimultaneousSamplingRunner(args, cfg, variant="offsets")
        n = runner.plain_sample(seed=5)
        assert n == cfg.model.num_classes + 1
        outs[chunks] = [
            np.load(f)
            for f in sorted(glob.glob(os.path.join(d, "samples_*.pth.npy")))
        ]
    for a, b in zip(outs[1], outs[2]):
        np.testing.assert_array_equal(a, b)


def test_ablation_plan_modes():
    """sampling.plan narrows the doThis progression (round-4 knob)."""
    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def runner(plan, variant):
        raw = yaml.safe_load(open(os.path.join(repo, "configs", "micro.yml")))
        raw["sampling"]["batch_size"] = 6
        raw["sampling"]["actualBatchSize"] = 3
        if plan:
            raw["sampling"]["plan"] = plan
        raw["parallel"] = {"enable": False}
        return SimultaneousSamplingRunner(
            argparse.Namespace(seed=0, image_folder="/tmp/x"),
            dict2namespace(raw), variant=variant,
        )

    assert runner(None, "poses")._ablation_plan() == [
        ("joint", 2), ("joint", 3), ("baseline", 3)
    ]
    assert runner("joint_only", "poses")._ablation_plan() == [("joint", 3)]
    assert runner("joint_baseline", "poses")._ablation_plan() == [
        ("joint", 3), ("baseline", 3)
    ]
    assert runner("joint_baseline", "offsets")._ablation_plan() == [
        ("joint", 3), ("baseline", 1)
    ]
    with pytest.raises(NotImplementedError):
        runner("bogus", "poses")._ablation_plan()


def test_sampling_compute_dtype_defaults_bf16():
    """Sampling default is the bfloat16 trunk when a config does not pin
    model.compute_dtype (PERF_NOTES round-4 bf16 table: -11% step time,
    0.2% MAE delta); an explicit pin wins either way.  Training keeps the
    float32 default (models/ncsnv2.py get_model)."""
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    args = argparse.Namespace(seed=0, image_folder="/tmp/unused")

    cfg = _cfg()
    assert cfg.model.compute_dtype == "float32"  # micro.yml pins f32
    runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
    assert runner.model.dtype == jnp.float32

    cfg = _cfg()
    del cfg.model.compute_dtype
    runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
    assert runner.model.dtype == jnp.bfloat16

    cfg = _cfg()
    cfg.model.compute_dtype = "bfloat16"
    runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
    assert runner.model.dtype == jnp.bfloat16
