# TPU-host image for geo_deep_learning_tpu (reference Dockerfile parity:
# 2-stage build with raster runtime libs; CUDA stage replaced by libtpu).
FROM python:3.12-slim AS builder

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libtiff-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY geo_deep_learning_tpu ./geo_deep_learning_tpu
COPY native ./native
COPY configs ./configs

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint chex einops \
       numpy pandas pyyaml pillow matplotlib \
    && pip install --no-cache-dir -e . --no-deps \
    && make -C native

FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
    libtiff6 && rm -rf /var/lib/apt/lists/*
COPY --from=builder /usr/local /usr/local
COPY --from=builder /app /app
WORKDIR /app

ENTRYPOINT ["python", "-m", "geo_deep_learning_tpu.cli.main"]
CMD ["fit", "--config", "configs/unetplus_config_RGB.yaml"]
