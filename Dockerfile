# Reproducible build/test environment for helen_tpu.
#
# The pipeline itself is hardware-portable: the SAME XLA program runs on TPU
# hosts (install the libtpu-enabled jax there) or on CPU (this image — the
# reference's ONNX-CPU mode equivalent, `helen_tpu --platform cpu`). The
# image is also what CI runs: pytest on a virtual 8-device CPU mesh, the
# AddressSanitizer harness for the native stitch library, and a bench smoke.
# (The reference ships a CUDA torch image + manual docker_test script,
# Dockerfile/Dockerfile, docker_test:6-46; this is its hermetic equivalent.)
FROM python:3.12-slim-bookworm

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make libhdf5-dev \
    && apt-get clean && rm -rf /var/lib/apt/lists/*

# torch is only needed for reference-checkpoint import/export and the torch
# oracle tests; the CPU wheel keeps the image small
RUN python -m pip install --no-cache-dir \
    "jax[cpu]" numpy h5py optax pytest matplotlib pyyaml \
    && python -m pip install --no-cache-dir \
    torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /opt/helen_tpu
COPY . .
RUN python -m pip install --no-cache-dir -e . \
    && make native

# default: the full hermetic check CI runs (see ci/run_checks.sh)
ENTRYPOINT ["bash"]
CMD ["ci/run_checks.sh"]
