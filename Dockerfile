# mspl_tpu — TPU JAX environment (reference shipped a CUDA-PyTorch
# Dockerfile; SURVEY.md §2 "Dockerfile / env").  For Cloud TPU VMs the host
# runtime is provided; this image carries the Python/toolchain stack.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /opt/mspl_tpu
COPY . .

RUN pip install --no-cache-dir \
        "jax[tpu]" flax optax numpy pillow tensorboardX pytest hypothesis \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# prebuild the native IO runtime
RUN mkdir -p native/build && \
    g++ -O3 -fPIC -shared -pthread native/mspl_io.cc -lz \
        -o native/build/libmspl_io.so || true

ENV PYTHONPATH=/opt/mspl_tpu
ENTRYPOINT ["python", "-m", "mspl_tpu.cli"]
