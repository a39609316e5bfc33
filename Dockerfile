# auralis-tpu serving image (reference parity: Dockerfile -> auralis.openai).
# Base image must provide libtpu; on Cloud TPU VMs use the JAX TPU wheel.
FROM python:3.11-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY auralis_tpu ./auralis_tpu
COPY native ./native

# g++/make build the first-party native audio runtime (FLAC codec, resampler);
# ffmpeg stays in the image to enable mp3/opus/aac response formats
RUN apt-get update && apt-get install -y --no-install-recommends g++ make ffmpeg \
    && make -C native \
    && apt-get purge -y g++ make && apt-get autoremove -y \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

ENV AURALIS_NATIVE_LIB=/app/native/libauralis_native.so

EXPOSE 8000
ENTRYPOINT ["auralis-tpu-openai"]
CMD ["--host", "0.0.0.0", "--port", "8000", "--model", "/models/xttsv2"]
