"""Second-method sampler: smoke + deterministic parity vs the reference."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    effective_origins,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import LangevinConfig
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.second_method import (
    SecondMethodConfig,
    mine_sampler_grid,
    simultaneous_second_method_sample,
)

REF = "/root/reference/LiDARGen"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")

B, H, W = 2, 8, 16


def _scorenet_torch(x, labels):
    return -0.2 * x


def _scorenet_jax(x, labels):
    return -0.2 * x


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    mask1 = (rng.uniform(size=(B, 1, H, W)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    sky = (rng.uniform(size=(B, 1, H, W)) > 0.2).astype(np.float32)
    # per-pixel point ids with some holes
    ids = rng.integers(-1, 40, (B, 1, H, W)).astype(np.float64)
    return x, refer, mask, sky, ids


def test_second_method_parity_setting4():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    torch.set_default_tensor_type = lambda *a, **k: None
    import models as ref_pkg

    x, refer, mask, sky, ids = _inputs()
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])

    images, _, _ = ref_pkg.anneal_Langevin_dynamics_inpainting_simultaneous_second_method(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        torch.from_numpy(sky), torch.from_numpy(ids), 0, 4, _scorenet_torch,
        torch.from_numpy(sigmas), torch.from_numpy(mods),
        n_steps_each=2, step_lr=1e-4, denoise=True, verbose=False,
        grad_ref=0.3, correlation_coefficient=0.05,
    )
    out_ref = images[-1].numpy()

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4)
    ours = simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        grad_ref=0.3,
    )
    ours, out_ref = np.asarray(ours), np.asarray(out_ref)
    diff = np.abs(ours - out_ref)
    ok = (diff < 1e-3).mean()
    assert np.median(diff) < 1e-5, np.median(diff)
    assert ok >= 0.98, f"{ok:.4%} within tol; max={diff.max()}"


def _run_parity(setting, n_views, seed, sigmas_n=3, ids_fn=None, tol=1e-3,
                frac=0.98, median_tol=1e-5):
    """Deterministic (zero-noise) parity vs the reference second method at
    models/__init__.py:604-1382."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    torch.set_default_tensor_type = lambda *a, **k: None
    import models as ref_pkg

    rng = np.random.default_rng(seed)
    b = n_views
    x = rng.uniform(0.05, 0.9, (b, 2, H, W)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (b, 2, H, W)).astype(np.float32)
    mask1 = (rng.uniform(size=(b, 1, H, W)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    sky = (rng.uniform(size=(b, 1, H, W)) > 0.2).astype(np.float32)
    if ids_fn is None:
        ids = rng.integers(-1, 40, (b, 1, H, W)).astype(np.float64)
    else:
        ids = ids_fn(rng, b)
    mods = np.stack(
        [np.zeros(3)] + [rng.uniform(-8, 8, 3) for _ in range(b - 1)]
    ).round(1)

    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), sigmas_n)).astype(np.float32)
    images, _, _ = ref_pkg.anneal_Langevin_dynamics_inpainting_simultaneous_second_method(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        torch.from_numpy(sky), torch.from_numpy(ids), 0, setting, _scorenet_torch,
        torch.from_numpy(sigmas), torch.from_numpy(mods),
        n_steps_each=2, step_lr=1e-4, denoise=True, verbose=False,
        grad_ref=0.3, correlation_coefficient=0.05,
    )
    out_ref = images[-1].numpy()

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=setting)
    ours = np.asarray(simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        raw_origins=jnp.asarray(mods, jnp.float32),
        grad_ref=0.3,
    ))
    diff = np.abs(ours - out_ref)
    ok = (diff < tol).mean()
    assert np.median(diff) < median_tol, np.median(diff)
    assert ok >= frac, f"{ok:.4%} within tol; max={diff.max()}"


def test_second_method_parity_setting7_four_views():
    """Median pull + hard GT reset vs the reference at 4 views
    (models/__init__.py:709-716,858-861,1078-1081)."""
    _run_parity(setting=7, n_views=4, seed=11)


def test_second_method_parity_setting4_four_views():
    _run_parity(setting=4, n_views=4, seed=5)


def test_second_method_fresh_id_collision_parity():
    """Fresh ids are minted as ``arange + max`` so the FIRST fresh id
    collides with the existing max id (reference models/__init__.py:832);
    colliding points are scatter-averaged together.  Inputs engineered so
    the collision path matters: one pixel holds the max id, many are -1."""

    def ids_fn(rng, b):
        ids = rng.integers(0, 6, (b, 1, H, W)).astype(np.float64)
        ids[rng.uniform(size=ids.shape) > 0.6] = -1
        ids[0, 0, 0, 0] = 39  # unique max id, guaranteed collision target
        return ids

    # ids 0..5 over 128 pixels/view make ~20-member scatter-average groups:
    # tree-order vs sequential fp sums move the median diff above the usual
    # 1e-5 (measured 1.2e-5); the within-1e-3 fraction is the real assert.
    _run_parity(setting=4, n_views=2, seed=21, ids_fn=ids_fn, median_tol=1e-4)


def test_second_method_smoke_setting7():
    x, refer, mask, sky, ids = _inputs(seed=3)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=1.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=7)
    out = simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        grad_ref=0.3,
    )
    out = np.asarray(out)
    assert out.shape == (B, 2, H, W)
    assert np.isfinite(out).all()


def test_second_method_multi_scene_vmap_independence():
    """G>1 scenes go through the runner as INDEPENDENT vmapped problems
    (VERDICT r2 #5): the sampler's id table / shared cloud is single-scene
    state (the reference only ever calls it with one scene's views,
    ncsn_runner_basic_simultaneous.py:624).  The G=2 batched run must equal
    two independent single-scene runs with the same per-scene rngs."""
    import argparse

    import jax
    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    raw = yaml.safe_load(open(os.path.join(repo, "configs", "micro.yml")))
    raw["sampling"]["batch_size"] = 4  # 2 scenes x 2 views
    raw["sampling"]["actualBatchSize"] = 2
    raw["sampling"]["method"] = "second"
    raw["sampling"]["setting"] = 4
    raw["parallel"] = {"enable": False}
    cfg = dict2namespace(raw)
    runner = SimultaneousSamplingRunner(
        argparse.Namespace(seed=0, image_folder="/tmp/unused"), cfg,
        variant="offsets",
    )
    assert runner.groups == 2
    # random-init real nets diverge through the exponential depth decode;
    # use the parity-test conventions (fake linear score, zero noise) — the
    # subject under test is the runner's vmap wiring, not the net
    import dataclasses

    runner._score_fn = lambda params: _scorenet_jax
    runner.lcfg = dataclasses.replace(runner.lcfg, noise_scale=0.0)

    rng = np.random.default_rng(7)
    b, h, w = 4, runner.rows, runner.cols
    x = rng.uniform(0.05, 0.9, (b, 2, h, w)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (b, 2, h, w)).astype(np.float32)
    mask1 = (rng.uniform(size=(b, 1, h, w)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    ids = rng.integers(-1, 40, (b, 1, h, w)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]], np.float32)
    origins = np.asarray(effective_origins(mods), np.float32)
    org4 = np.tile(origins, (2, 1))
    raw4 = np.tile(mods, (2, 1))
    params = runner.load_params(rng=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    batched = np.asarray(
        runner._jit_second_method(2)(
            params, key, jnp.asarray(x), jnp.asarray(refer), jnp.asarray(mask),
            jnp.asarray(ids), jnp.asarray(org4), jnp.asarray(raw4),
        )
    )

    # independent single-scene references with the SAME per-scene keys
    scene_keys = jax.random.split(key, 2)
    singles = []
    for g, skey in enumerate(scene_keys):
        sl = slice(2 * g, 2 * g + 2)
        lcfg = runner.lcfg
        scfg = SecondMethodConfig(
            grid=mine_sampler_grid(h, w), setting=4
        )
        singles.append(
            np.asarray(
                simultaneous_second_method_sample(
                    skey, jnp.asarray(x[sl]), _scorenet_jax,
                    runner.sigmas, lcfg, scfg,
                    refer_image=jnp.asarray(refer[sl]),
                    refer_mask=jnp.asarray(mask[sl]),
                    refer_indices=jnp.asarray(ids[sl]),
                    origins=jnp.asarray(origins),
                    raw_origins=jnp.asarray(mods),
                    grad_ref=runner.grad_ref,
                )
            )
        )
    expected = np.concatenate(singles)
    diff = np.abs(batched - expected)
    assert (diff <= 1e-5).mean() > 0.999, diff.max()


def test_second_method_kitti_pose_body_parity_stub():
    """The reference's pose twin (KITTISampling.py:515-1299) is a
    byte-identical copy of the offsets second method except denoise=False
    (:518) — its fromWorld/toWorld args are never used and its
    ``modificationList`` is undefined (NameError, :608).  With that global
    stubbed in, the body must match our sampler with denoise off."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    torch.set_default_tensor_type = lambda *a, **k: None
    from models import KITTISampling as ref_kitti

    x, refer, mask, sky, ids = _inputs(seed=9)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    ref_kitti.modificationList = torch.from_numpy(mods)  # fix the NameError
    identity = torch.eye(4).tile(B, 1, 1)

    images, _, _ = (
        ref_kitti.anneal_Langevin_dynamics_inpainting_simultaneous_second_method_kitti(
            torch.from_numpy(x.copy()), torch.from_numpy(refer),
            torch.from_numpy(mask), torch.from_numpy(sky),
            torch.from_numpy(ids), 0, 4, _scorenet_torch,
            torch.from_numpy(sigmas), identity, identity,
            n_steps_each=2, step_lr=1e-4, denoise=True, verbose=False,
            grad_ref=0.3, correlation_coefficient=0.05,
        )
    )
    out_ref = images[-1].numpy()

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=False, noise_scale=0.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4)
    ours = np.asarray(simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        raw_origins=jnp.asarray(mods, jnp.float32),
        grad_ref=0.3,
    ))
    diff = np.abs(ours - out_ref)
    ok = (diff < 1e-3).mean()
    assert np.median(diff) < 1e-5, np.median(diff)
    assert ok >= 0.98, f"{ok:.4%} within tol; max={diff.max()}"


def test_second_method_pose_variant_translation_equals_offsets():
    """Debugged pose redesign self-consistency: when to_world is a pure
    translation by the effective origins (from_world its inverse), the
    world-frame path must reproduce the offsets path exactly."""
    x, refer, mask, sky, ids = _inputs(seed=13)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    eff = effective_origins(mods).astype(np.float32)
    tw = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    fw = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    tw[:, :3, 3] = eff
    fw[:, :3, 3] = -eff

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=False, noise_scale=0.0)
    common = dict(
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids), grad_ref=0.3,
    )
    offsets = np.asarray(simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax,
        jnp.asarray(sigmas), cfg,
        SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4),
        origins=jnp.asarray(eff), **common,
    ))
    poses = np.asarray(simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax,
        jnp.asarray(sigmas), cfg,
        SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4, variant="poses"),
        origins=jnp.asarray(eff),  # ignored in pose mode
        to_world=jnp.asarray(tw), from_world=jnp.asarray(fw), **common,
    ))
    np.testing.assert_allclose(poses, offsets, atol=1e-4)


def test_second_method_pose_variant_rotation_finite():
    """A real rotation in the pose stack (what the offsets variant cannot
    express) still produces finite, in-range images."""
    x, refer, mask, sky, ids = _inputs(seed=17)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    ang = 0.3
    c, s = np.cos(ang), np.sin(ang)
    tw = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    tw[1, :2, :2] = [[c, -s], [s, c]]
    tw[1, :3, 3] = [4.0, -2.0, 0.5]
    fw = np.linalg.inv(tw).astype(np.float32)

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=False, noise_scale=0.0)
    out = np.asarray(simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax,
        jnp.asarray(sigmas), cfg,
        SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4, variant="poses"),
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids), grad_ref=0.3,
        origins=jnp.zeros((B, 3), jnp.float32),
        to_world=jnp.asarray(tw), from_world=jnp.asarray(fw),
    ))
    assert out.shape == (B, 2, H, W)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_runner_pose_second_method_chunked_plumbing():
    """Runner-level pose second method: chunked (exec_level_chunks=2) and
    single-execution programs agree at G=2 scenes with pose matrices."""
    import argparse

    import jax
    import yaml

    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace
    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def make_runner(chunks):
        raw = yaml.safe_load(open(os.path.join(repo, "configs", "micro.yml")))
        raw["sampling"]["batch_size"] = 4  # 2 scenes x 2 views
        raw["sampling"]["actualBatchSize"] = 2
        raw["sampling"]["method"] = "second"
        raw["sampling"]["setting"] = 4
        raw["sampling"]["exec_level_chunks"] = chunks
        raw["parallel"] = {"enable": False}
        cfg = dict2namespace(raw)
        import dataclasses

        runner = SimultaneousSamplingRunner(
            argparse.Namespace(seed=0, image_folder="/tmp/unused"), cfg,
            variant="poses",
        )
        runner._score_fn = lambda params: _scorenet_jax
        runner.lcfg = dataclasses.replace(runner.lcfg, noise_scale=0.0)
        return runner

    r1, r2 = make_runner(1), make_runner(2)
    rng = np.random.default_rng(5)
    b, h, w = 4, r1.rows, r1.cols
    x = rng.uniform(0.05, 0.9, (b, 2, h, w)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (b, 2, h, w)).astype(np.float32)
    mask1 = (rng.uniform(size=(b, 1, h, w)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    ids = rng.integers(-1, 40, (b, 1, h, w)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]], np.float32)
    org4 = np.tile(np.asarray(effective_origins(mods), np.float32), (2, 1))
    raw4 = np.tile(mods, (2, 1))
    tw = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    tw[:, :3, 3] = rng.uniform(-3, 3, (b, 3))
    fw = np.linalg.inv(tw).astype(np.float32)

    params = r1.load_params(rng=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    args = (
        params, key, jnp.asarray(x), jnp.asarray(refer), jnp.asarray(mask),
        jnp.asarray(ids), jnp.asarray(org4), jnp.asarray(raw4),
        jnp.asarray(tw), jnp.asarray(fw),
    )
    single = np.asarray(r1._jit_second_method(2)(*args))
    chunked = np.asarray(r2._jit_second_method(2)(*args))
    assert single.shape == (b, 2, h, w)
    assert np.isfinite(single).all()
    np.testing.assert_allclose(chunked, single, atol=1e-6)


def test_second_method_iota_sort_mode_matches_carry():
    """Renumber-sort payload routing (round-4 sort lever): iota-gather ==
    carried payloads bitwise (stable sort)."""
    x, refer, mask, sky, ids = _inputs(seed=23)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    outs = {}
    for mode in ("carry", "iota"):
        scfg = SecondMethodConfig(
            grid=mine_sampler_grid(H, W), setting=4, sort_payload_mode=mode
        )
        outs[mode] = np.asarray(simultaneous_second_method_sample(
            jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax,
            jnp.asarray(sigmas), cfg, scfg,
            refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
            refer_indices=jnp.asarray(ids),
            origins=jnp.asarray(effective_origins(mods), jnp.float32),
            grad_ref=0.3,
        ))
    np.testing.assert_array_equal(outs["iota"], outs["carry"])
