# slacken_tpu container (reference: Dockerfile — Spark image + assembly jar;
# here: python + jax with the TPU plugin + this package).
#
# Build:  docker build -t slacken-tpu .
# Run:    docker run -v /data:/data slacken-tpu classify -i /data/idx ...
# On a Cloud TPU VM the libtpu device nodes are exposed with --privileged
# (or the TPU device plugin under GKE).
FROM python:3.12-slim

# gzip for subprocess inflate; g++/make build the native parser extension
RUN apt-get update \
  && apt-get install -y --no-install-recommends gzip g++ make \
  && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/slacken_tpu

# TPU wheel set; for CPU-only use, swap to plain 'jax'
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
  && pip install --no-cache-dir numpy fsspec

COPY pyproject.toml ./
COPY slacken_tpu ./slacken_tpu
COPY native ./native
COPY slacken-tpu.sh ./
RUN pip install --no-cache-dir .

ENV STPU_TMP=/data/scratch
ENV STPU_JIT_CACHE=/data/jit_cache

ENTRYPOINT ["/opt/slacken_tpu/slacken-tpu.sh"]
CMD ["--help"]
