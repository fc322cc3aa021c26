"""Pipeline-level golden regression: tiny-config model on a fixed synthetic
image, outputs pinned to a committed fixture.

The reference validates its export against a live PyTorch baseline on a demo
image (export.py:267-275); real mmdet weights and mmdet itself are not
available in this environment, so the golden here is this framework's own
frozen output — catching unintended numeric drift from refactors (layout
changes, kernel rewrites, dtype policy changes) at the whole-model level.

Regenerate (only after intentionally changing numerics):
    python tests/test_golden_regression.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_golden.npz")


def _tiny_forward():
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr

    cfg = tiny_test_config()
    H = W = 64
    model, params = build_codetr(
        cfg, dtype=jnp.float32, msda_impl="reference", input_shape=(H, W), seed=7
    )
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.stack(
        [np.sin(xx / 7.0), np.cos(yy / 5.0), np.sin((xx + yy) / 11.0)], axis=-1
    ).astype(np.float32)
    masks = np.zeros((1, H, W), np.float32)
    masks[0, :, W - 8 :] = 1.0  # padded strip exercises the mask path
    boxes, scores, labels = jax.jit(model.apply)(
        params, jnp.asarray(img)[None], jnp.asarray(masks)
    )
    return np.asarray(boxes), np.asarray(scores), np.asarray(labels)


@pytest.mark.slow
def test_tiny_model_matches_golden_fixture():
    boxes, scores, labels = _tiny_forward()
    assert np.isfinite(boxes).all() and np.isfinite(scores).all()
    if not os.path.exists(FIXTURE):
        import pytest

        pytest.skip("golden fixture not generated")
    ref = np.load(FIXTURE)
    np.testing.assert_allclose(scores, ref["scores"], atol=2e-4, rtol=1e-4)
    # top-k ties can permute equal-score rows; compare box sets by sorting
    np.testing.assert_allclose(
        np.sort(boxes.reshape(-1)), np.sort(ref["boxes"].reshape(-1)),
        atol=2e-3, rtol=1e-3,
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # mirror tests/conftest.py exactly — the fixture must be produced under
    # the same jax config the suite runs with (x64 changes weak-type promotion)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        boxes, scores, labels = _tiny_forward()
        np.savez(FIXTURE, boxes=boxes, scores=scores, labels=labels)
        print("wrote", FIXTURE)
