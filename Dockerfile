# Reproducible build/test environment for helen_tpu.
#
# The pipeline itself is hardware-portable: the SAME XLA program runs on TPU
# hosts (install the libtpu-enabled jax there) or on CPU (this image — the
# reference's ONNX-CPU mode equivalent, `helen_tpu --platform cpu`). The
# image is also what CI runs: pytest on a virtual 8-device CPU mesh, the
# AddressSanitizer harness for the native stitch library, and a bench smoke.
# (The reference ships a CUDA torch image + manual docker_test script,
# Dockerfile/Dockerfile, docker_test:6-46; this is its hermetic equivalent.)

# ---- stage 1: MarginPolish v1.3.0, pinned exactly as the reference pins it
# (reference marginpolish.cmake:7-13 fetches tag v1.3.0 and builds with
# cmake+make; setup.py:82-90 ships the resulting binary in helen/bin). This
# closes the from-BAM user journey: the image can run
# `helen_tpu-marginpolish` without a system MarginPolish install.
FROM debian:bookworm-slim AS marginpolish
RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        git ca-certificates cmake make gcc g++ \
        zlib1g-dev libbz2-dev liblzma-dev libcurl4-openssl-dev libssl-dev \
        autoconf automake libtool pkg-config libhdf5-dev \
    && apt-get clean && rm -rf /var/lib/apt/lists/*
RUN git clone --recursive --branch v1.3.0 --depth 1 \
        https://github.com/UCSC-nanopore-cgl/MarginPolish.git /opt/marginpolish
WORKDIR /opt/marginpolish/build
RUN cmake .. -DCMAKE_BUILD_TYPE=Release && make -j"$(nproc)" \
    && test -x ./marginPolish

# ---- stage 2: the helen_tpu runtime/CI image
FROM python:3.12-slim-bookworm

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make libhdf5-dev \
        zlib1g libbz2-1.0 liblzma5 libcurl4 \
    && apt-get clean && rm -rf /var/lib/apt/lists/*

# torch is only needed for reference-checkpoint import/export and the torch
# oracle tests; the CPU wheel keeps the image small
RUN python -m pip install --no-cache-dir \
    "jax[cpu]" numpy h5py optax pytest matplotlib pyyaml \
    && python -m pip install --no-cache-dir \
    torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /opt/helen_tpu
COPY . .
COPY --from=marginpolish /opt/marginpolish/build/marginPolish /usr/local/bin/marginPolish
RUN python -m pip install --no-cache-dir -e . \
    && make native \
    # smoke: the wrapper must find and exec the bundled pinned binary
    # (exit 127 = not found; anything else means it ran)
    && sh -c 'helen_tpu-marginpolish --version >/dev/null 2>&1; [ $? -ne 127 ]'

# default: the full hermetic check CI runs (see ci/run_checks.sh)
ENTRYPOINT ["bash"]
CMD ["ci/run_checks.sh"]
