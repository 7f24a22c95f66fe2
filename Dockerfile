# eitx service container.
#
# Deployment parity with the reference's two-service compose
# (docker-compose.yaml + kt_service/Dockerfile there): one service image
# exposing the five upload endpoints on :5001 with volumes for weights,
# logs and generation results. The web UI replaces the separate Streamlit
# container (serve it from the same process at /ui).
#
# Base image choice: jax[tpu] wheels for TPU VMs; plain jax works on CPU.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY eitx ./eitx
COPY bench.py ./
# in-repo trained checkpoints (auto-discovered; a ./weights volume mount
# overrides them)
COPY weights ./weights

# TPU hosts: pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax numpy scipy pillow \
    && pip install --no-cache-dir -e . \
    && make -C eitx/native

VOLUME ["/app/weights", "/app/logs", "/app/generation_results"]
EXPOSE 5001

CMD ["python", "-m", "eitx.serve.http", "--host", "0.0.0.0", "--port", "5001"]
