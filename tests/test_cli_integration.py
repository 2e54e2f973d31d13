"""End-to-end CLI integration on CPU with the micro config (subprocess)."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
