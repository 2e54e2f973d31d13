import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.config import cfg_get, load_config
from simultaneous_diffusion_for_pointclouds_tpu.diffusion import get_sigmas

REF_CFG = "/root/reference/LiDARGen/configs/HDVMine_Line.yml"


def test_reference_config_loads_unchanged():
    cfg = load_config(REF_CFG)
    assert cfg.model.num_classes == 232
    assert cfg.model.sigma_begin == 50
    assert cfg.model.sigma_end == 0.01
    assert cfg.sampling.actualBatchSize == 7
    assert cfg.sampling.batch_size == 42
    assert cfg.data.image_size == 64
    assert cfg.data.image_width == 1024
    assert cfg.sampling.inpainting is True
    assert len(cfg.data.modifications) == 7


def test_cfg_get_defaults():
    cfg = load_config(REF_CFG)
    assert cfg_get(cfg, "model.ngf") == 128
    assert cfg_get(cfg, "model.not_a_key", 7) == 7
    assert cfg_get(cfg, "nope.nope", "d") == "d"


def test_geometric_sigmas_match_reference_formula():
    cfg = load_config(REF_CFG)
    sigmas = np.asarray(get_sigmas(cfg))
    expected = np.exp(np.linspace(np.log(50.0), np.log(0.01), 232))
    np.testing.assert_allclose(sigmas, expected, rtol=1e-6)
    assert sigmas[0] == pytest.approx(50.0)
    assert sigmas[-1] == pytest.approx(0.01)


def test_uniform_sigmas():
    sigmas = np.asarray(
        get_sigmas(sigma_begin=1.0, sigma_end=0.1, num_classes=10, dist="uniform")
    )
    np.testing.assert_allclose(sigmas, np.linspace(1.0, 0.1, 10), rtol=1e-6)
