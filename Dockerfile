# memo-tpu container (the reference ships a Dockerfile building MONI +
# samtools + seqtk, reference Dockerfile:1-39; this image needs neither —
# the matching-statistics engine is in-repo C++ compiled on first use).
#
# CPU image by default; for TPU VMs start from a jax[tpu]-provisioned base
# or pip install jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /memo-tpu
COPY pyproject.toml README.md ./
COPY memo_tpu ./memo_tpu
RUN pip install --no-cache-dir "jax" "numpy" "pyarrow" "matplotlib" && \
    pip install --no-cache-dir -e .

ENTRYPOINT ["memo-tpu"]
CMD ["--help"]
