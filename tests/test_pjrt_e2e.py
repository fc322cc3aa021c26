"""End-to-end native-runtime test: export a tiny model, execute it through
``csrc/codetr_pjrt_runner`` (PJRT C API, no Python), and compare its raw
outputs against the same executable run from Python.

The reference analog runs a real TRT network through its plugin
(csrc_tests/test_plugin.py:57-161) and real engines through its C++ binary
(codetr_inference.cpp:322-438).  Here the runner compiles the serialized
StableHLO via a PJRT plugin: the axon tunnel plugin when this host has one
(its client options are read from jax's live registration), else a local
libtpu.  Skips when no plugin can create a client (CPU-only CI).

Slow-marked: the runner's TPU compile of even the tiny model takes ~1 min
through the remote-compile helper.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "csrc", "build", "codetr_pjrt_runner")
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"

pytestmark = pytest.mark.slow


def _axon_client_options():
    """The PJRT_Client_Create options jax's axon registration uses (topology,
    session_id, remote_compile, ...) — the runner needs the same ones."""
    import jax._src.xla_bridge as xb

    reg = xb._backend_factories.get("axon")
    if reg is None:
        return None
    factory = reg.factory
    opts = getattr(factory, "keywords", {}).get("options")
    if not opts and getattr(factory, "args", None):
        for a in factory.args:
            if isinstance(a, dict):
                opts = a
    return opts


def _plugin_and_options():
    if os.path.exists(AXON_PLUGIN):
        opts = _axon_client_options()
        if opts:
            return AXON_PLUGIN, opts
    import glob

    libtpu = glob.glob("/opt/venv/lib/python3*/site-packages/libtpu/libtpu.so")
    if libtpu:
        return libtpu[0], {}
    return None, None


def test_pjrt_runner_executes_exported_model(tmp_path):
    if not os.path.exists(RUNNER):
        pytest.skip("codetr_pjrt_runner not built")
    plugin, opts = _plugin_and_options()
    if plugin is None:
        pytest.skip("no PJRT plugin available")

    import jax
    import jax.numpy as jnp

    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.runtime.aot import save_executable

    H = W = 64
    cfg = tiny_test_config()
    model, params = build_codetr(
        cfg, dtype=jnp.float32, msda_impl="reference", input_shape=(H, W)
    )
    fn = lambda p, x, m: model.apply(p, x, m)
    example = (
        jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.zeros((1, H, W), jnp.float32),
    )
    art = str(tmp_path / "tiny.codetr.xla")
    save_executable(art, fn, example, params=params)
    assert os.path.exists(art + ".stablehlo")
    assert os.path.exists(art + ".params.npz")

    # raw RGB input, preprocessed by the runner's host library; the Python
    # side reuses the SAME native preprocess so the comparison isolates the
    # execute path (preprocess parity is covered by test_native.py)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 56, 3), np.uint8)
    raw = str(tmp_path / "img.bin")
    img.tofile(raw)

    dump = str(tmp_path / "out")
    cmd = [
        RUNNER, "--plugin", plugin,
        "--model", art + ".stablehlo",
        "--params", art + ".params.npz",
        "--image", raw, "--image-height", "48", "--image-width", "56",
        "--height", str(H), "--width", str(W),
        "--iterations", "1", "--dump-raw", dump,
    ]
    for k, v in (opts or {}).items():
        cmd += ["--client-option", f"{k}={v}"]
    env = dict(os.environ)
    env.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env)
    if "Client_Create" in out.stderr and out.returncode != 0:
        pytest.skip(f"PJRT client unavailable here: {out.stderr[-300:]}")
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "ok" in out.stdout

    boxes_c = np.fromfile(dump + ".boxes.bin", np.float32).reshape(-1, 4)
    scores_c = np.fromfile(dump + ".scores.bin", np.float32)
    labels_c = np.fromfile(dump + ".labels.bin", np.float32)
    n = cfg.head.max_per_img
    assert boxes_c.shape == (n, 4)
    assert scores_c.shape == (n,) and labels_c.shape == (n,)

    # Python side: same native preprocess, same weights, jax execute
    from codetr_tpu.utils import native

    if not native.native_available():
        pytest.skip("native host library not built (needed for preprocess parity)")
    arr, mask, _, _ = native.preprocess_native(
        img, H, W, (123.675, 116.28, 103.53), (58.395, 57.12, 57.375)
    )
    got = jax.jit(fn)(params, jnp.asarray(arr)[None], jnp.asarray(mask)[None])
    boxes_p, scores_p, labels_p = (np.asarray(t)[0] for t in got)

    # the two stacks compile the same StableHLO with different pipelines;
    # tolerate fp32 jitter, compare score-sorted (top-k ties can reorder)
    o_c = np.argsort(-scores_c, kind="stable")
    o_p = np.argsort(-scores_p, kind="stable")
    np.testing.assert_allclose(scores_c[o_c], scores_p[o_p], atol=1e-3)
    np.testing.assert_allclose(boxes_c[o_c], boxes_p[o_p], atol=0.5)
    assert (labels_c[o_c] == labels_p[o_p]).mean() > 0.7
