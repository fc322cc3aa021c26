"""Native host library (C++) vs the Python implementations.

Skipped when csrc/build/libcodetr_host.so has not been built
(cmake -S csrc -B csrc/build && cmake --build csrc/build)."""

import os

import numpy as np
import pytest

from codetr_tpu.utils import native

CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native host library not built"
)


def test_version():
    lib = native.load_host_library()
    assert lib.codetr_host_version() == b"codetr-tpu-host-0.1.0"


def test_preprocess_matches_python():
    from codetr_tpu.config import PreprocessConfig
    from codetr_tpu.utils.preprocess import preprocess_numpy

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 96, 3), np.uint8)
    cfg = PreprocessConfig()
    out_py, mask_py, sf_py, rs_py = preprocess_numpy(img, 64, 64, cfg)
    out_c, mask_c, sf_c, rs_c = native.preprocess_native(img, 64, 64, cfg.mean, cfg.std)
    assert rs_c == rs_py
    assert sf_c == pytest.approx(sf_py)
    np.testing.assert_array_equal(mask_c, mask_py)
    # cv2 INTER_LINEAR uses fixed-point interpolation internally; allow small
    # quantization differences
    np.testing.assert_allclose(out_c, out_py, atol=2e-2)


def test_nms_matches_python_oracle():
    from tests.test_nms import np_nms, random_boxes

    rng = np.random.default_rng(1)
    boxes = np.tile(random_boxes(rng, 32), (2, 1))
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    labels = np.repeat(np.array([0, 1], np.int32), 32)
    keep_c = native.batched_nms_native(boxes, scores, labels, 0.5)
    k0 = np_nms(boxes[:32], scores[:32], 0.5)
    k1 = np_nms(boxes[32:], scores[32:], 0.5)
    np.testing.assert_array_equal(keep_c, np.concatenate([k0, k1]))


def test_nms_score_threshold():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.05], np.float32)
    labels = np.zeros(2, np.int32)
    keep = native.batched_nms_native(boxes, scores, labels, 0.5, score_threshold=0.1)
    assert keep.tolist() == [True, False]


def test_pjrt_runner_smoke():
    """The native PJRT runner (csrc/codetr_pjrt_runner.cpp) loads a PJRT
    plugin and validates the API table — the analog of the reference's
    plugin-registry smoke test (csrc_tests/test_plugin.cpp)."""
    import glob
    import subprocess

    runner = os.path.join(CSRC_DIR, "build", "codetr_pjrt_runner")
    if not os.path.exists(runner):
        pytest.skip("codetr_pjrt_runner not built")
    plugins = glob.glob(
        "/opt/venv/lib/python3*/site-packages/libtpu/libtpu.so"
    )
    if not plugins:
        pytest.skip("no PJRT plugin (.so) available")
    out = subprocess.run(
        [runner, "--plugin", plugins[0], "--smoke"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "smoke ok" in out.stdout
    assert "pjrt api version" in out.stdout


def test_npz_reader_matches_numpy(tmp_path):
    """csrc/npz_reader.h parses np.savez output byte-for-byte (the runner's
    --params path consumes exactly this producer, runtime/aot.py:134)."""
    import subprocess

    exe = os.path.join(CSRC_DIR, "build", "test_npz")
    if not os.path.exists(exe):
        pytest.skip("test_npz not built")
    rng = np.random.default_rng(0)
    arrs = {
        "backbone/stage0/kernel": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "head/bias": rng.standard_normal((7,)).astype(np.float32),
        "ids": np.arange(6, dtype=np.int32).reshape(2, 3),
        "scalar": np.float32(3.5).reshape(()),
    }
    path = str(tmp_path / "t.npz")
    np.savez(path, **arrs)
    out = subprocess.run([exe, path], capture_output=True, text=True, check=True)

    def checksum(a):
        s = 0
        for c in a.tobytes():
            s = (s * 131 + c) % (1 << 64)
        return s

    for name, a in arrs.items():
        dt = {"float32": "f4", "int32": "i4"}[str(a.dtype)]
        shape = ",".join(str(d) for d in a.shape)
        line = f"{name} {dt} [{shape}] {a.nbytes} {checksum(a)}"
        assert line in out.stdout, (line, out.stdout)
