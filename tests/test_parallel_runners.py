"""The (data, view) mesh is the production code path (VERDICT r2 #1).

The reference wraps its model in ``nn.DataParallel`` on every train and
sample path (ncsn_runner.py:55, ncsn_runner_kitti_simultaneous.py:104,481);
our equivalent is ``parallel.maybe_mesh`` + the sharded wrappers, engaged by
``trainer_for``'s trainers and ``SimultaneousSamplingRunner`` whenever more
than one device is visible.  These tests run the SAME runner entry points
sharded (8 virtual CPU devices) and unsharded and require matching results.
"""

import argparse
import glob
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

# 8-device mesh + subprocess CLI runs -- slow tier (pytest.ini)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(**overrides):
    from simultaneous_diffusion_for_pointclouds_tpu.config import dict2namespace

    raw = yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml")))
    raw["sampling"]["batch_size"] = 8  # 4 scenes x 2 views: divides the mesh
    raw["training"]["batch_size"] = 8
    raw["data"]["synthetic_frames"] = 16
    raw.setdefault("parallel", {}).update(overrides)
    return dict2namespace(raw)


def _frac_close(a, b, tol=1e-4):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b)) <= tol))


def test_maybe_mesh_dispatch():
    import jax

    from simultaneous_diffusion_for_pointclouds_tpu.parallel import maybe_mesh

    assert len(jax.devices()) == 8
    m = maybe_mesh(_cfg())  # auto: engages on 8 devices
    assert m is not None and dict(m.shape) == {"data": 8, "view": 1}
    m = maybe_mesh(_cfg(enable=True, n_view=2))
    assert dict(m.shape) == {"data": 4, "view": 2}
    assert maybe_mesh(_cfg(enable=False)) is None


def test_best_batch_axes_fallback():
    from simultaneous_diffusion_for_pointclouds_tpu.parallel import (
        best_batch_axes,
        make_mesh,
    )

    mesh = make_mesh(n_view=2)  # (4, 2)
    assert best_batch_axes(mesh, 16) == ("data", "view")
    assert best_batch_axes(mesh, 4) == ("data",)
    assert best_batch_axes(mesh, 6) == ("view",)
    assert best_batch_axes(mesh, 7) is None


def test_sampler_sharded_matches_unsharded():
    """runner._jit_simultaneous — the exact entry sample() dispatches —
    produces the same images on the (4, 2) mesh as unsharded."""
    import jax
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
        SimultaneousSamplingRunner,
    )

    args = argparse.Namespace(seed=0, image_folder="/tmp/unused")
    outs = {}
    for name, overrides in (
        ("sharded", dict(enable=True, n_view=2)),
        ("plain", dict(enable=False)),
    ):
        cfg = _cfg(**overrides)
        runner = SimultaneousSamplingRunner(args, cfg, variant="poses")
        assert (runner.mesh is not None) == (name == "sharded")
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
    assert np.isfinite(outs["sharded"]).all()
    assert _frac_close(outs["sharded"], outs["plain"]) > 0.999


def test_train_step_sharded_matches_unsharded():
    """trainer._train_step — the exact entry train() dispatches — gives the
    same loss and parameters on the mesh as unsharded (gradient psum over
    the batch == single-device batch reduction)."""
    import jax
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.runners import trainer_for

    results = {}
    for name, overrides in (
        ("sharded", dict(enable=True, n_view=2)),
        ("plain", dict(enable=False)),
    ):
        cfg = _cfg(**overrides)
        t = trainer_for(argparse.Namespace(seed=0), cfg)
        assert (t.mesh is not None) == (name == "sharded")
        b, c = 8, 2
        h, w = cfg.data.image_size, cfg.data.image_width
        rng = jax.random.PRNGKey(1)
        x = jax.random.uniform(rng, (b, c, h, w), jnp.float32)
        mask = (jax.random.uniform(jax.random.PRNGKey(2), (b, c, h, w)) > 0.5).astype(
            jnp.float32
        )
        state = t.init_state(jax.random.PRNGKey(0), x)
        state, x_out, loss = t._train_step(state, rng, x, x, mask, 0)
        results[name] = (float(loss), np.asarray(x_out), state["params"])
    assert np.isclose(results["sharded"][0], results["plain"][0], rtol=1e-5)
    assert _frac_close(results["sharded"][1], results["plain"][1]) > 0.999
    leaves_s = jax.tree.leaves(results["sharded"][2])
    leaves_p = jax.tree.leaves(results["plain"][2])
    for ls, lp in zip(leaves_s, leaves_p):
        assert _frac_close(ls, lp, tol=1e-5) > 0.999


def test_cli_train_and_sample_parallel(tmp_path):
    """main.py train + sample through the mesh (8 virtual devices), via a
    config with an explicit parallel section."""
    raw = yaml.safe_load(open(os.path.join(REPO, "configs", "micro.yml")))
    raw["sampling"]["batch_size"] = 8
    raw["training"]["batch_size"] = 8
    raw["training"]["n_iters"] = 2
    raw["data"]["synthetic_frames"] = 16
    raw["parallel"] = {"enable": True, "n_view": 2}
    cfg_path = tmp_path / "parallel_micro.yml"
    cfg_path.write_text(yaml.dump(raw))

    env = dict(os.environ)
    for mode_args in (
        ["--ni", "--config", str(cfg_path)],
        ["--sample", "--ni", "--config", str(cfg_path), "--max_batches", "1"],
    ):
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"import sys; sys.argv=['main.py']+{mode_args!r}+"
            f"['--exp',{str(tmp_path)!r},'--doc','t'];"
            "import runpy; runpy.run_path('main.py', run_name='__main__')"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=580,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    log = os.path.join(tmp_path, "logs", "t")
    assert "mesh" in open(os.path.join(log, "stdout.txt")).read()
    outs = glob.glob(
        os.path.join(tmp_path, "image_samples", "images", "*Masked_completion*.npy")
    )
    assert outs, "no completion outputs written"
    assert np.isfinite(np.load(outs[0])).all()
