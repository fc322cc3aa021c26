"""End-to-end Inferencer + preprocessing + AOT round-trip on the tiny model."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codetr_tpu.config import tiny_test_config
from codetr_tpu.inferencer import Inferencer
from codetr_tpu.models.codetr import build_codetr
from codetr_tpu.runtime.aot import benchmark, compile_forward, load_executable, save_executable
from codetr_tpu.utils.preprocess import preprocess_numpy, rescale_size


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    model, params = build_codetr(cfg, msda_impl="reference", input_shape=(64, 64))
    return cfg, model, params


def test_rescale_size_keep_ratio():
    # mmcv semantics: scale = min(new/old), round(old * scale + 0.5)
    assert rescale_size(640, 480, 1152, 768) == (1024, 768)
    assert rescale_size(1920, 1280, 1152, 768) == (1152, 768)
    assert rescale_size(100, 300, 608, 608) == (203, 608)


def test_preprocess_matches_reference_semantics():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 96, 3), np.uint8)
    out, mask, sf, (th, tw) = preprocess_numpy(img, 64, 64)
    assert out.shape == (64, 64, 3)
    # keep-ratio: 96 -> 64 wide, 48 -> 32 high
    assert (tw, th) == (64, 32)
    assert sf == (64 / 96, 32 / 48)
    # mask: 0 inside image, 1 in padding (export.py:126-128)
    assert mask[:32, :64].sum() == 0
    assert mask[32:].all()
    # padded region is zero after normalization
    assert np.all(out[32:] == 0)


def test_preprocess_in_graph_matches_numpy():
    """Device-fused normalize+pad+mask == the host path at fixed shapes
    (north-star: preprocessing inside the compiled graph)."""
    import jax

    from codetr_tpu.config import PreprocessConfig
    from codetr_tpu.utils.preprocess import preprocess_in_graph, resize_to_canvas

    cfg = PreprocessConfig()
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (h, w, 3), np.uint8)
            for h, w in ((48, 96), (64, 64), (31, 17))]
    host = [preprocess_numpy(im, 64, 64, cfg) for im in imgs]
    cans = [resize_to_canvas(im, 64, 64) for im in imgs]
    for (h_out, h_mask, h_sf, h_thw), (canvas, thw, sf) in zip(host, cans):
        assert thw == h_thw and sf == h_sf
    canvas = np.stack([c[0] for c in cans])
    thw = np.asarray([c[1] for c in cans], np.int32)
    fused = jax.jit(lambda c, t: preprocess_in_graph(
        c, t, mean=tuple(cfg.mean), std=tuple(cfg.std)))
    out, mask = fused(jnp.asarray(canvas), jnp.asarray(thw))
    for j, (h_out, h_mask, _, _) in enumerate(host):
        np.testing.assert_array_equal(np.asarray(mask)[j], h_mask)
        np.testing.assert_allclose(np.asarray(out)[j], h_out, atol=1e-5)


@pytest.mark.slow
def test_inferencer_device_preprocess_matches_host(tiny):
    """The fused-serving Inferencer (uint8 in, preprocessing in-graph) must
    reproduce the host-preprocessed detections exactly."""
    cfg, model, params = tiny
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 255, (h, w, 3), np.uint8)
            for h, w in ((50, 60), (64, 40))]
    host = Inferencer(model, params, cfg, height=64, width=64,
                      score_threshold=0.0, iou_threshold=0.8)
    dev = Inferencer(model, params, cfg, height=64, width=64,
                     score_threshold=0.0, iou_threshold=0.8,
                     device_preprocess=True)
    ref, got = host(imgs), dev(imgs)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r.keep, g.keep)
        np.testing.assert_allclose(r.scores[r.keep], g.scores[g.keep],
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(r.boxes[r.keep], g.boxes[g.keep],
                                   atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_aot_fused_preprocess_roundtrip(tiny):
    """compile_forward(fuse_preprocess=True) -> serialize -> reload: the
    executable accepts uint8 canvases and matches the direct fused call."""
    cfg, model, params = tiny
    fn, example = compile_forward(
        model, params, height=64, width=64,
        fuse_preprocess=True, preprocess_cfg=cfg.preprocess,
    )
    assert example[0].dtype == jnp.uint8 and example[1].dtype == jnp.int32
    rng = np.random.default_rng(13)
    canvas = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    thw = jnp.asarray([[48, 64]], jnp.int32)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tiny_fused.codetr.xla")
        save_executable(path, fn.fused_apply, example, params=params)
        loaded = load_executable(path)
        a = fn(canvas, thw)
        b = loaded(canvas, thw)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.slow
def test_inferencer_batched_serving_matches_single(tiny):
    """Batched serving mode (VERDICT r2 item 5): 3 images through bs=2 (one
    padded final batch) must reproduce the per-image bs=1 results, including
    per-image scale factors."""
    cfg, model, params = tiny
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.uint8)
        for h, w in ((50, 60), (64, 40), (30, 64))
    ]
    single = Inferencer(model, params, cfg, height=64, width=64,
                        score_threshold=0.0, iou_threshold=0.8)
    batched = Inferencer(model, params, cfg, height=64, width=64, batch_size=2,
                         score_threshold=0.0, iou_threshold=0.8)
    ref = single(imgs)
    got = batched(imgs)
    assert len(got) == 3
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r.keep, g.keep)
        np.testing.assert_array_equal(r.labels[r.keep], g.labels[g.keep])
        np.testing.assert_allclose(r.scores[r.keep], g.scores[g.keep], atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(r.boxes[r.keep], g.boxes[g.keep], atol=1e-3, rtol=1e-4)


def test_inferencer_end_to_end(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (50, 60, 3), np.uint8)
    inf = Inferencer(model, params, cfg, height=64, width=64,
                     score_threshold=0.0, iou_threshold=0.8)
    dets = inf([img])
    assert len(dets) == 1
    d = dets[0]
    assert d.boxes.shape == (cfg.head.max_per_img, 4)
    kept = d.compact()
    # boxes rescaled to original image coordinates: canvas width 64 maps to 60
    assert np.all(kept.boxes[:, 2] <= 60 + 1e-3)
    out = d.to_dict()
    assert set(out) == {"labels", "scores", "bboxes"}


@pytest.mark.slow
def test_aot_save_load_roundtrip(tiny):
    cfg, model, params = tiny
    fn, example = compile_forward(model, params, height=64, width=64)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tiny.codetr.xla")
        save_executable(path, fn, example)
        assert os.path.exists(path) and os.path.exists(path + ".meta.json")
        assert os.path.exists(path + ".stablehlo")  # native-runtime input
        loaded = load_executable(path)
        a = fn(*example)
        b = loaded(*example)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.slow
def test_aot_save_load_weights_as_args(tiny):
    """Engine format used by export_aot.py: module takes the weight pytree
    as an argument, weights ship in a companion .params.npz (baked-constant
    modules exceed this environment's remote-compile payload limits)."""
    cfg, model, params = tiny
    fn, example = compile_forward(model, params, height=64, width=64)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tiny.codetr.xla")
        save_executable(
            path, lambda p, x, m: model.apply(p, x, m), example, params=params
        )
        assert os.path.exists(path + ".params.npz")
        loaded = load_executable(path)
        a = fn(*example)
        b = loaded(*example)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_benchmark_helper(tiny):
    cfg, model, params = tiny
    fn, example = compile_forward(model, params, height=64, width=64)
    stats = benchmark(fn, example, iterations=2, warmup=1)
    assert stats["device_ms_per_iter"] > 0


@pytest.mark.slow
def test_profiling_utilities(tiny):
    from codetr_tpu.utils.profiling import cost_analysis, latency_report, save_hlo

    cfg, model, params = tiny
    fn = lambda x, m: model.apply(params, x, m)
    import jax.numpy as jnp
    args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64)))
    rep = latency_report(fn, args, iterations=2)
    assert rep["device_compute_ms"] > 0 and rep["dispatch_ms"] >= 0
    ca = cost_analysis(fn, args)
    assert ca.get("flops", 0) > 0
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = save_hlo(fn, args, os.path.join(td, "model.hlo"))
        assert os.path.getsize(p) > 1000


@pytest.mark.slow
def test_bf16_model_forward(tiny):
    """bf16 compute policy produces finite, close-to-fp32 outputs."""
    import jax, jax.numpy as jnp, numpy as np
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import CoDETR

    cfg, model32, params = tiny
    model16 = CoDETR(cfg=cfg, dtype=jnp.bfloat16, msda_impl="reference")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 64, 64, 3)), jnp.float32)
    m = jnp.zeros((1, 64, 64))
    b32, s32, l32 = model32.apply(params, x, m)
    b16, s16, l16 = model16.apply(params, x, m)
    assert bool(jnp.all(jnp.isfinite(b16)))
    # scores in [0,1]; bf16 noise flips top-k membership, so compare coarsely
    assert abs(float(s16[0, 0]) - float(s32[0, 0])) < 0.2
