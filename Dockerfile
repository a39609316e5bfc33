# auralis-tpu serving image (reference parity: Dockerfile -> auralis.openai).
# Base image must provide libtpu; on Cloud TPU VMs use the JAX TPU wheel.
FROM python:3.11-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY auralis_tpu ./auralis_tpu

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

EXPOSE 8000
ENTRYPOINT ["auralis-tpu-openai"]
CMD ["--host", "0.0.0.0", "--port", "8000", "--model", "/models/xttsv2"]
