"""Build the native grid-subsampling CPython extensions.

    cd simultaneous_diffusion_for_pointclouds_tpu/native
    python setup.py build_ext --inplace

Produces ``grid_subsampling`` and ``grid_subsampling_lidar`` modules with
the reference-compatible ``compute(points, features=None, classes=None,
sampleDl=0.1, method="barycenters", verbose=0)`` API.
"""

import numpy as np
from setuptools import Extension, setup

common = dict(
    sources=["grid_subsampling/module.cpp"],
    include_dirs=[np.get_include(), "grid_subsampling"],
    extra_compile_args=["-std=c++17", "-O3"],
    language="c++",
)

setup(
    name="sdpc_native",
    version="0.1.0",
    ext_modules=[
        Extension("grid_subsampling", **common),
        Extension(
            "grid_subsampling_lidar",
            sources=["grid_subsampling/module_lidar.cpp"],
            include_dirs=[np.get_include(), "grid_subsampling"],
            extra_compile_args=["-std=c++17", "-O3"],
            language="c++",
        ),
    ],
)
