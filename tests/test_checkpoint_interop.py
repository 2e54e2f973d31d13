"""Reference-checkpoint interop + exist-mask fixture tests.

Covers the reference sample-path semantics at
ncsn_runner_kitti_simultaneous.py:472-489 (torch.load of a
``[model_sd, opt_sd, epoch, step, ema_sd]`` list with DataParallel
``module.`` prefixes, EMA weights applied before sampling) and :527-533
(existTotalLiDARGenSettings.npy -> max/3 threshold -> binary erosion x4).
"""

import argparse
import copy
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from simultaneous_diffusion_for_pointclouds_tpu.models import NCSNLiDARSmall
from simultaneous_diffusion_for_pointclouds_tpu.runners.sample import (
    EXIST_MASK_FALLBACKS,
    build_exist_mask,
)
from simultaneous_diffusion_for_pointclouds_tpu.utils.checkpoint import (
    load_score_params,
)

REF = "/root/reference/LiDARGen"
FIXTURE = "/root/reference/MeasureResults/existTotalLiDARGenSettings.npy"


def _small_config(channels=2, h=16, w=32, ngf=16, num_classes=8):
    ns = argparse.Namespace
    return ns(
        data=ns(
            channels=channels, image_size=h, image_width=w,
            logit_transform=False, rescaled=False, dataset="KITTI",
        ),
        model=ns(
            sigma_begin=50.0, sigma_end=0.01, num_classes=num_classes,
            sigma_dist="geometric", normalization="InstanceNorm++",
            nonlinearity="elu", ngf=ngf,
        ),
        device="cpu",
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.slow
def test_reference_pth_checkpoint_roundtrip(tmp_path):
    """A reference-layout .pth (DataParallel prefixes, 5-element list) loads
    through load_score_params and yields the EMA weights' forward outputs."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import models.ncsnv2 as ref_ncsnv2

    cfg = _small_config()
    torch.manual_seed(0)
    ref = ref_ncsnv2.NCSN_LiDAR_small(cfg)
    wrapped = torch.nn.DataParallel(ref)  # keys gain the "module." prefix

    # EMA state: a perturbed copy of the live PARAMETERS with bare keys —
    # EMAHelper shadows only requires_grad parameters, never buffers like
    # ``sigmas`` (reference models/ema.py:4-21).
    ema_sd = {
        k: v.detach() + 0.05 * torch.randn_like(v)
        for k, v in ref.named_parameters() if v.requires_grad
    }

    opt = torch.optim.Adam(ref.parameters(), lr=1e-4)
    states = [wrapped.state_dict(), opt.state_dict(), 3, 100000, ema_sd]
    path = tmp_path / "checkpoint_100000.pth"
    torch.save(states, str(path))

    # torch oracle: EMA weights applied over the live model (:485-489),
    # buffers (sigmas) untouched — as EMAHelper.ema() does
    full_sd = {k: copy.deepcopy(v) for k, v in ref.state_dict().items()}
    full_sd.update({k: v.clone() for k, v in ema_sd.items()})
    ema_model = ref_ncsnv2.NCSN_LiDAR_small(cfg)
    ema_model.load_state_dict(full_sd)
    ema_model.eval()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 2, 16, 32)).astype(np.float32)
    labels = np.array([1, 5])
    with torch.no_grad():
        want = ema_model(torch.from_numpy(x), torch.from_numpy(labels)).numpy()

    flax_model = NCSNLiDARSmall(cfg)
    params = load_score_params(str(path), flax_model, x, labels)
    got = np.asarray(flax_model.apply({"params": params}, x, labels))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    # without the EMA entry the live (model) weights must be used instead
    torch.save(states[:4], str(path))
    params_live = load_score_params(str(path), flax_model, x, labels)
    ref.eval()
    with torch.no_grad():
        want_live = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    got_live = np.asarray(flax_model.apply({"params": params_live}, x, labels))
    np.testing.assert_allclose(got_live, want_live, rtol=2e-3, atol=2e-4)
    assert not np.allclose(got, got_live)


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture unavailable")
def test_exist_mask_matches_reference_pipeline():
    """build_exist_mask on the real checked-in fixture reproduces the
    reference's threshold+erosion exactly (:527-533)."""
    import scipy.ndimage

    vals = np.load(FIXTURE)
    want = vals > np.max(vals) / 3
    want[2:] = scipy.ndimage.binary_erosion(want[2:], border_value=1, iterations=4)

    got = build_exist_mask(FIXTURE, batch=3, rows=64, cols=1024)
    assert got.shape == (3, 64, 1024)
    np.testing.assert_array_equal(got[0].astype(bool), want)
    np.testing.assert_array_equal(got[1], got[0])
    # the fixture is non-trivial: some pixels masked, some kept
    assert 0 < got[0].sum() < got[0].size


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture unavailable")
def test_exist_mask_default_falls_back_to_reference_fixture():
    """On this box /data/... does not exist; the default path must resolve
    to the checked-in reference fixture, NOT silently all-ones."""
    assert FIXTURE in EXIST_MASK_FALLBACKS
    got = build_exist_mask("/data/existTotalLiDARGenSettings.npy", 1, 64, 1024)
    direct = build_exist_mask(FIXTURE, 1, 64, 1024)
    if not os.path.isfile("/data/existTotalLiDARGenSettings.npy"):
        np.testing.assert_array_equal(got, direct)
        assert got[0].sum() < got[0].size  # not all-ones


def test_restore_falls_back_to_numpy_on_topology_mismatch(tmp_path, monkeypatch):
    """A checkpoint saved on one device topology (the TPU chip) cannot be
    plain-restored on another (CPU tests): Orbax raises ValueError rebuilding
    the recorded shardings.  restore_checkpoint must fall back to a
    topology-independent numpy restore — with and without a target tree."""
    import jax
    import optax
    import orbax.checkpoint as ocp

    from simultaneous_diffusion_for_pointclouds_tpu.utils import checkpoint as ckpt

    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt_state": optax.ScaleByAdamState(
            count=np.int32(7),
            mu={"w": np.full((2, 3), 0.5, np.float32)},
            nu={"w": np.full((2, 3), 0.25, np.float32)},
        ),
    }
    ckpt.save_checkpoint(str(tmp_path), state, step=3)

    # Simulate the cross-topology failure: any restore WITHOUT explicit
    # numpy restore_args raises, exactly like a foreign-device sharding.
    orig = ocp.PyTreeCheckpointer.restore

    def strict(self, path, *args, **kwargs):
        if kwargs.get("restore_args") is None:
            raise ValueError("Device TPU v5 lite0 was not found")
        return orig(self, path, *args, **kwargs)

    monkeypatch.setattr(ocp.PyTreeCheckpointer, "restore", strict)

    flat = ckpt.restore_checkpoint(str(tmp_path), step=3)
    np.testing.assert_array_equal(flat["params"]["w"], state["params"]["w"])
    assert isinstance(jax.tree.leaves(flat)[0], np.ndarray)

    # With a target, container types (optax NamedTuples) must be recovered
    # with fields routed by NAME, not flatten order.
    restored = ckpt.restore_checkpoint(str(tmp_path), step=3, target=state)
    assert isinstance(restored["opt_state"], optax.ScaleByAdamState)
    assert int(restored["opt_state"].count) == 7
    np.testing.assert_array_equal(restored["opt_state"].nu["w"], state["opt_state"].nu["w"])

    # load_score_params' Orbax-dir path takes the same fallback.
    params = ckpt.load_score_params(
        os.path.join(str(tmp_path), "ckpt_3"), None, None, None
    )
    np.testing.assert_array_equal(params["w"], state["params"]["w"])


def test_exist_mask_shape_mismatch_is_all_ones(tmp_path):
    bad = tmp_path / "exist.npy"
    np.save(bad, np.ones((8, 8)))
    got = build_exist_mask(str(bad), 2, 64, 1024)
    assert got.shape == (2, 64, 1024)
    assert (got == 1).all()


def test_resolve_ckpt_dir_skips_incomplete_rolling(tmp_path):
    """A clone can carry a rolling ``ckpt/`` whose manifests are tracked but
    whose OCDBT data blobs are not (blob files churn every save).  The
    resolver must detect the incomplete dir and fall back to the newest
    complete ``ckpt_{step}`` snapshot; restore/load paths go through it."""
    import json
    import shutil

    from simultaneous_diffusion_for_pointclouds_tpu.utils import checkpoint as ckpt

    state = {"params": {"w": np.arange(4, dtype=np.float32)}}
    ckpt.save_checkpoint(str(tmp_path), state, step=5, progress={"step": 5})
    state2 = {"params": {"w": np.arange(4, dtype=np.float32) + 1}}
    ckpt.save_checkpoint(str(tmp_path), state2, step=9, progress={"step": 9})

    rolling = tmp_path / "ckpt"
    assert ckpt.is_complete_ckpt(str(rolling))
    # intact rolling dir resolves to itself and outranks ckpt_5/ckpt_9
    assert ckpt.resolve_ckpt_dir(str(rolling)) == str(rolling)
    assert ckpt.resolve_ckpt_dir(str(tmp_path)) == str(rolling)

    # gut the rolling dir's data blobs (what a fresh clone sees)
    shutil.rmtree(rolling / "ocdbt.process_0" / "d")
    assert not ckpt.is_complete_ckpt(str(rolling))
    assert ckpt.resolve_ckpt_dir(str(rolling)) == str(tmp_path / "ckpt_9")
    assert ckpt.resolve_ckpt_dir(str(tmp_path)) == str(tmp_path / "ckpt_9")

    # load_score_params and restore_checkpoint ride the fallback
    params = ckpt.load_score_params(str(rolling), None, None, None)
    np.testing.assert_array_equal(params["w"], state2["params"]["w"])
    restored = ckpt.restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(restored["params"]["w"], state2["params"]["w"])

    # nothing restorable -> None / clear error
    shutil.rmtree(tmp_path / "ckpt_9")
    shutil.rmtree(tmp_path / "ckpt_5")
    assert ckpt.resolve_ckpt_dir(str(rolling)) is None
    with pytest.raises(FileNotFoundError):
        ckpt.load_score_params(str(rolling), None, None, None)


def test_synthetic_one_world_covers_all_frames():
    """World consistency across scene groups: a provider asked for more
    frames than one group must serve every frame from ONE corridor world,
    so Line view targets never cross into a different cloud."""
    from simultaneous_diffusion_for_pointclouds_tpu.data.synthetic import (
        SyntheticScanProvider,
    )

    p = SyntheticScanProvider(num_frames=96, n_points=2000, group_frames=48)
    assert p.group_frames == 96
    p.scan(0)
    p.scan(95)
    assert len(p._worlds) == 1
