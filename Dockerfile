# TPU-native simultaneous diffusion — container build.
# Counterpart of the reference's Dockerfile (pytorch base + pip reqs);
# here: a JAX TPU base image plus this package and its native extension.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

# jax[tpu] pulls libtpu on TPU VMs; CPU wheels otherwise.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint einops pyyaml scipy pillow opencv-python-headless \
    h5py pytest && \
    cd simultaneous_diffusion_for_pointclouds_tpu/native && \
    python setup.py build_ext --inplace

CMD ["python", "main.py", "--help"]
