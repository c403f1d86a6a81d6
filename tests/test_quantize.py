"""Dynamic-PTQ int8 conv path (the serving-mode neck) and the model's
inference override hooks."""

import numpy as np

import jax
import jax.numpy as jnp

from odc_tpu.models.layers import ConvBnLeaky
from odc_tpu.models.yolov2 import YOLOv2
from odc_tpu.ops.detect import make_infer_fn
from odc_tpu.ops.quantize import (
    int8_conv_bn_leaky,
    quantize_dynamic,
    quantize_weights_per_channel,
)


def test_quantize_dynamic_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2.0, (4, 7, 7, 16)).astype(np.float32))
    q, scale = quantize_dynamic(x)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * float(scale)
    # worst-case quantization error is scale/2
    assert np.abs(back - np.asarray(x)).max() <= float(scale) * 0.5 + 1e-6


def test_quantize_weights_per_channel():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
    q, scale = quantize_weights_per_channel(k)
    assert q.shape == k.shape and scale.shape == (16,)
    back = np.asarray(q, np.float32) * np.asarray(scale)
    assert np.abs(back - np.asarray(k)).max() <= np.asarray(scale).max() * 0.5


def test_int8_conv_bn_leaky_close_to_bf16():
    rng = np.random.default_rng(2)
    m = ConvBnLeaky(64, (3, 3))
    x = jnp.asarray(rng.normal(0, 1, (2, 13, 13, 96)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x, False)).astype(np.float32)
    got = np.asarray(
        int8_conv_bn_leaky(
            x,
            v["params"]["Conv_0"],
            v["params"]["BatchNorm_0"],
            v["batch_stats"]["BatchNorm_0"],
            out_dtype=jnp.float32,
        )
    )
    # layer-level PTQ error: a couple percent of the dynamic range
    tol = 0.03 * np.abs(ref).max()
    assert np.abs(ref - got).max() < tol


def test_infer_int8_neck_close_to_bf16():
    """End-to-end v2 inference with the quantized neck: same kept set at a
    robust threshold, near-identical box geometry."""
    rng = np.random.default_rng(3)
    model = YOLOv2()
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8))
    variables = model.init(jax.random.key(0), img)

    f16 = make_infer_fn(model, conf_thre=0.45, iou_thre=0.5, max_keep=32)
    f8 = make_infer_fn(
        model, conf_thre=0.45, iou_thre=0.5, max_keep=32, int8_neck=True
    )
    b16, c16, s16, k16 = [np.asarray(o) for o in f16(variables, img)]
    b8, c8, s8, k8 = [np.asarray(o) for o in f8(variables, img)]
    assert k8.sum() > 0
    # conf scores of kept boxes match within PTQ tolerance
    n = min(k16.sum(), k8.sum())
    np.testing.assert_allclose(c16[0][:n], c8[0][:n], atol=0.02)
    np.testing.assert_allclose(b16[0][:n], b8[0][:n], atol=1.5)


def test_stem_out_hook_matches_full_path():
    """Feeding the backbone its own stage1-2 output via ``stem_out`` must
    reproduce the full forward exactly (the hook fused stems plug into)."""
    import flax.linen as nn

    from odc_tpu.models.backbones.darknet19 import Darknet19Backbone, _Stage, _STAGES
    from odc_tpu.models.layers import imagenet_normalize, max_pool_2x2

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8))
    bb = Darknet19Backbone()
    v = bb.init(jax.random.key(0), img)

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = imagenet_normalize(x, jnp.float32)
            h = _Stage(_STAGES[0], name="stage1")(h, False)
            h = max_pool_2x2(h)
            h = _Stage(_STAGES[1], name="stage2")(h, False)
            return max_pool_2x2(h)

    stem = StemOnly()
    stem_v = {
        "params": {k: v["params"][k] for k in ("stage1", "stage2")},
        "batch_stats": {k: v["batch_stats"][k] for k in ("stage1", "stage2")},
    }
    stem_out = stem.apply(stem_v, img)

    c5_ref, c7_ref = bb.apply(v, img)
    c5_got, c7_got = bb.apply(v, img, stem_out=stem_out)
    np.testing.assert_array_equal(np.asarray(c5_ref), np.asarray(c5_got))
    np.testing.assert_array_equal(np.asarray(c7_ref), np.asarray(c7_got))
