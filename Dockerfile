# movenet_tpu runtime image (TPU host).
#
# The reference shipped python:3.9-slim (CPU) and an nvidia/cuda devel
# image (GPU); the TPU equivalent is a plain Python image — TPU access
# comes from libtpu via the jax[tpu] wheel, no driver toolchain needed.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md Makefile ./
COPY movenet_tpu ./movenet_tpu
COPY experiments ./experiments
COPY scripts ./scripts
COPY bench.py ./

# TPU: jax[tpu]; CPU-only dev: jax
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint numpy pyyaml \
    && pip install --no-cache-dir --no-build-isolation -e . \
    && python -m movenet_tpu.native.build

# real-codec validation: this image has real ffmpeg, so assert the
# python decode path and native/pipeline.cpp produce bit-identical
# batches from actual mpeg4/aac media (scripts/validate_codec.py)
RUN make codec-validate

ENTRYPOINT ["python", "-m", "movenet_tpu.train.cli"]
