"""Windowed splat-matmul MSDA (ops/msda_win.py) vs the exact reference.

The kernel runs through the Pallas interpreter on CPU (interpret=True);
exactness inside win_envelope_mask's domain, and combined exactness with
the dispatcher's out-of-envelope correction, mirror the shift-window
suite (test_msda_grid.py).  Reference semantics: grid_sample bilinear,
zeros padding, align_corners=False (codetr/csrc/ms_deform_attn.cu:211-261
is the reference's CUDA analog of the sampling being tested here).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.ops.msda import msda_grid_qm, msda_reference_qm
from codetr_tpu.ops.msda_win import msda_win_qm, win_envelope_mask
from test_msda_grid import grid_inputs


def to_qm(loc, w):
    loc = jnp.asarray(loc).transpose(0, 2, 3, 4, 5, 1)
    attw = jnp.asarray(w).transpose(0, 2, 3, 4, 1)
    return loc[..., 0, :], loc[..., 1, :], attw


@pytest.mark.parametrize("shapes,radius,jitter", [
    (((8, 8), (4, 4), (2, 2)), 4, 3.0),
    (((6, 10), (3, 5)), 4, 3.0),
    (((19, 13), (10, 7), (5, 4)), 4, 3.0),  # ceil-div pyramid, non-square
    (((8, 8),), 3, 2.0),
])
def test_win_matches_reference_in_envelope(shapes, radius, jitter):
    rng = np.random.default_rng(0)
    value, loc, w = grid_inputs(rng, shapes, radius=radius, jitter=jitter)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=radius)
    w_in = jnp.where(mask, attw, 0)
    ref = msda_reference_qm(v, shapes, x, y, w_in)
    got = msda_win_qm(v, shapes, x, y, w_in, radius=radius, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("shapes,radius,jitter", [
    # grids large enough that windows are strict level subsets, jitter far
    # beyond the radius -> the exact-gather correction must fire
    (((40, 40), (20, 20), (10, 10)), 4, 9.0),
    (((37, 41), (19, 21)), 3, 12.0),
])
@pytest.mark.slow
def test_win_dispatch_exact_for_arbitrary_offsets(shapes, radius, jitter):
    rng = np.random.default_rng(7)
    value, loc, w = grid_inputs(rng, shapes, radius=radius, jitter=jitter)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=radius)
    assert float(jnp.mean(mask)) < 0.999, "test must exercise the correction"
    ref = msda_reference_qm(v, shapes, x, y, attw)
    got = msda_grid_qm(v, shapes, x, y, attw, impl="win", radius=radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_win_sparse_correction_tiers():
    """The out-of-envelope correction is tiered: a count-bounded sparse
    compact+gather when taps fit the budget, the full masked oracle when
    they don't.  Both must be exact (the sparse tier is what keeps trained
    checkpoints off the 130/773 ms full-gather path, ROUND3_NOTES.md)."""
    from codetr_tpu.ops.msda import _win_exact_ad
    from codetr_tpu.ops.msda_win import win_envelope_mask

    shapes, radius, jitter = ((40, 40), (20, 20), (10, 10)), 4, 9.0
    rng = np.random.default_rng(7)
    value, loc, w = grid_inputs(rng, shapes, radius=radius, jitter=jitter)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=radius)
    n_out = int((~np.asarray(mask) & (np.asarray(attw) != 0)).sum())
    assert n_out > 100  # both tiers must be exercised
    ref = msda_reference_qm(v, shapes, x, y, attw)
    for budget in (1 << 16, max(1, n_out // 2)):  # sparse tier / full tier
        got = _win_exact_ad(v, shapes, x, y, attw, radius, True, budget)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-5,
            err_msg=f"budget {budget}",
        )


def test_win_grad_matches_oracle_ad():
    """impl="win" carries a custom VJP (fused pair-table backward, since
    pallas_call has no AD rule); its grads must equal the oracle's XLA AD,
    including when the out-of-envelope correction fires."""
    import jax

    shapes, radius, jitter = ((40, 40), (20, 20)), 4, 9.0
    rng = np.random.default_rng(11)
    value, loc, w = grid_inputs(rng, shapes, radius=radius, jitter=jitter)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    gw = jax.grad(
        loss(lambda *a: msda_grid_qm(*a, impl="win", radius=radius)),
        argnums=(0, 2, 3, 4),
    )(v, shapes, x, y, attw)
    gr = jax.grad(loss(msda_reference_qm), argnums=(0, 2, 3, 4))(
        v, shapes, x, y, attw
    )
    for name, a, b in zip(("value", "x", "y", "w"), gw, gr):
        mag = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4 * mag, err_msg=name
        )


def test_win_zero_padding_at_image_edge():
    """Taps hanging off the image edge must reproduce grid_sample zeros
    padding (window clamped to the level -> missing cells contribute 0)."""
    shapes = ((6, 6), (3, 3))
    rng = np.random.default_rng(1)
    value, loc, w = grid_inputs(rng, shapes, radius=3, jitter=2.9)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=3)
    w_in = jnp.where(mask, attw, 0)
    ref = msda_reference_qm(v, shapes, x, y, w_in)
    got = msda_win_qm(v, shapes, x, y, w_in, radius=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_win_envelope_mask_is_tight():
    """Taps just inside the envelope boundary are exact; the mask's
    complement really marks taps the kernel drops (win output with raw
    weights deviates from the oracle only where the mask is False)."""
    shapes = ((48, 48),)
    radius = 2
    rng = np.random.default_rng(3)
    value, loc, w = grid_inputs(rng, shapes, radius=radius, jitter=9.0)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=radius)
    frac = float(jnp.mean(mask))
    assert 0.1 < frac < 0.999
    # in-envelope-only weights: exact
    w_in = jnp.where(mask, attw, 0)
    ref = msda_reference_qm(v, shapes, x, y, w_in)
    got = msda_win_qm(v, shapes, x, y, w_in, radius=radius, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
    # NOTE: taps just outside the envelope contribute PARTIAL hat sums (the
    # in-window corners only) — that is precisely why the dispatcher splits
    # the weights rather than running the kernel on raw weights
    # (ops/msda.py:msda_grid_qm).  Combined exactness is covered by
    # test_win_dispatch_exact_for_arbitrary_offsets.


def test_win_kernel_count_matches_envelope_mask():
    """The kernel's in-kernel out-of-envelope count (with_count=True) must
    equal the caller-side count derived from win_envelope_mask — it gates
    the exactness correction in msda.py:_win_exact_ad."""
    rng = np.random.default_rng(3)
    shapes = ((13, 9), (7, 5))
    for jitter in (1.5, 8.0):
        value, loc, w = grid_inputs(rng, shapes, radius=4, jitter=jitter)
        x, y, attw = to_qm(loc, w)
        v = jnp.asarray(value)
        mask = win_envelope_mask(shapes, x, y, radius=4)
        want = int(jnp.sum(jnp.where(mask, 0, attw) != 0))
        out, n = msda_win_qm(
            v, shapes, x, y, attw, radius=4, interpret=True, with_count=True
        )
        assert int(n) == want, (jitter, int(n), want)
        # and the masked output must equal the reference restricted to
        # in-envelope taps (the kernel masks internally now)
        ref = msda_reference_qm(v, shapes, x, y, jnp.where(mask, attw, 0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_win_five_level_oracle_fallback_exact():
    """At 5 pyramid levels the two coarsest query levels route through the
    exact flat-gather oracle inside msda_win_qm (their tiles are <16
    queries; the splat kernel's lane padding + stride-4 windows would blow
    the scoped-vmem limit — see _tile_shape_for_level).  The composite
    must stay exact end-to-end through the auto dispatcher, and the
    envelope mask must report those levels in-envelope."""
    rng = np.random.default_rng(11)
    shapes = ((32, 32), (16, 16), (8, 8), (4, 4), (2, 2))
    value, loc, w = grid_inputs(rng, shapes, radius=4, jitter=2.0)
    x, y, attw = to_qm(loc, w)
    v = jnp.asarray(value)
    mask = win_envelope_mask(shapes, x, y, radius=4)
    # coarse query levels (q >= 1360 = 32*32+16*16+8*8) are all-True
    assert bool(jnp.all(mask[..., 1360:]))
    ref = msda_reference_qm(v, shapes, x, y, attw)
    got = msda_grid_qm(v, shapes, x, y, attw, impl="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
