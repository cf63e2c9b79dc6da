# s2sr_tpu service image (TPU host).
#
# Counterpart of the reference's server Dockerfile (CPU/torch); this
# one targets a TPU VM base image with JAX preinstalled. The app itself
# is pure Python + one optional native .so built at image build time.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libpng-dev zlib1g-dev curl \
        tesseract-ocr fonts-dejavu-core \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# JAX for TPU (pinned by deploy environment); CPU fallback for dev images
ARG JAX_VARIANT=jax[tpu]
RUN pip install --no-cache-dir "${JAX_VARIANT}" \
        flax optax orbax-checkpoint pydantic requests pillow numpy scipy \
        pytesseract

COPY s2sr_tpu/ /app/s2sr_tpu/
COPY bench.py /app/

# build the native PNG encoder
RUN make -C /app/s2sr_tpu/native

# data layout identical to the reference (Dockerfile:38-40)
RUN mkdir -p /app/data/source /app/data/tiles /app/data/tiles_sr \
             /app/data/tiles_wow /app/data/sr /app/data/wow \
             /app/data/uploads /app/data/vectors /app/models /app/config

ENV DATA_DIR=/app/data \
    AOI_PATH=/app/config/aoi.geojson \
    WEIGHTS_DIR=/app/models \
    SERVER_HOST=0.0.0.0 \
    SERVER_PORT=8080

EXPOSE 8080
HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD curl -sf http://localhost:8080/health || exit 1

# On TPU nodes, precompile the production executables into the
# persistent XLA cache before taking traffic (cold compiles of the
# 23-block model run minutes through a compile service — measured
# first-pipeline 69 s cold vs 13 s warm). Run as an initContainer or a
# pre-start hook sharing S2SR_JAX_CACHE:
#   python -m s2sr_tpu.cli.warmup

CMD ["python", "-m", "s2sr_tpu.cli.serve"]
