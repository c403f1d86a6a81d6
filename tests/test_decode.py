import numpy as np
import pytest

import jax.numpy as jnp

from odc_tpu.ops.decode import decode_v1, decode_v2, YOLOV2_ANCHORS


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _decode_v1_oracle(y, hw, a):
    """Independent numpy oracle for the reference v1 decode semantics
    (models/yolov1.py:250-428): sigmoid-wh, per-cell class prob."""
    b, hg, wg, d = y.shape
    c = d - a * 5
    t = y[..., : a * 5].reshape(b, hg, wg, a, 5)
    sig = _sigmoid(t)
    cx = np.arange(wg).reshape(1, 1, wg, 1)
    cy = np.arange(hg).reshape(1, hg, 1, 1)
    bx = sig[..., 0] + cx
    by = sig[..., 1] + cy
    bw = wg * sig[..., 2]
    bh = hg * sig[..., 3]
    ch, cw = hw[0] / hg, hw[1] / wg
    boxes = np.stack(
        [
            (bx - bw / 2) * cw,
            (by - bh / 2) * ch,
            (bx + bw / 2) * cw,
            (by + bh / 2) * ch,
        ],
        axis=-1,
    )
    conf = sig[..., 4]
    cls_prob = _softmax(y[..., -c:])
    cls_spec = cls_prob[..., None, :] * conf[..., :, None]
    return sig[..., 0:2], sig[..., 2:4], boxes, conf, cls_prob, cls_spec


def _decode_v2_oracle(y, hw, anchors):
    """Independent numpy oracle for the reference v2 decode semantics
    (models/yolov2.py:466-640): anchor-exp wh, per-anchor class prob."""
    b, hg, wg, a, d = y.shape
    anchors = np.asarray(anchors)
    sig_txty = _sigmoid(y[..., 0:2])
    exp_twth = np.exp(y[..., 2:4])
    conf = _sigmoid(y[..., 4])
    cx = np.arange(wg).reshape(1, 1, wg, 1)
    cy = np.arange(hg).reshape(1, hg, 1, 1)
    bx = sig_txty[..., 0] + cx
    by = sig_txty[..., 1] + cy
    bw = anchors[:, 0] * exp_twth[..., 0]
    bh = anchors[:, 1] * exp_twth[..., 1]
    ch, cw = hw[0] / hg, hw[1] / wg
    boxes = np.stack(
        [
            (bx - bw / 2) * cw,
            (by - bh / 2) * ch,
            (bx + bw / 2) * cw,
            (by + bh / 2) * ch,
        ],
        axis=-1,
    )
    cls_prob = _softmax(y[..., 5:])
    cls_spec = cls_prob * conf[..., None]
    return sig_txty, exp_twth, boxes, conf, cls_prob, cls_spec


def test_decode_v1_matches_oracle():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 7, 7, 2 * 5 + 20)).astype(np.float32)
    det = decode_v1(jnp.asarray(y), (224, 224), num_anchors=2)
    oracle = _decode_v1_oracle(y, (224, 224), 2)
    names = ["sig_txty", "twth", "boxes", "conf", "cls_prob", "cls_spec"]
    for name, ours, ref in zip(names, det, oracle):
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=1e-2, atol=2e-4, err_msg=name
        )
    assert det.cls_prob.shape == (2, 7, 7, 20)
    assert det.cls_spec.shape == (2, 7, 7, 2, 20)


def test_decode_v2_matches_oracle():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(2, 13, 13, 5, 25)).astype(np.float32)
    det = decode_v2(jnp.asarray(y), (416, 416))
    oracle = _decode_v2_oracle(y, (416, 416), YOLOV2_ANCHORS)
    names = ["sig_txty", "twth", "boxes", "conf", "cls_prob", "cls_spec"]
    for name, ours, ref in zip(names, det, oracle):
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=1e-2, atol=2e-4, err_msg=name
        )
    assert det.cls_prob.shape == (2, 13, 13, 5, 20)


def test_decode_v2_anchor_scaling():
    # tw = 0 -> bw equals the anchor width exactly.
    y = np.zeros((1, 13, 13, 5, 25), dtype=np.float32)
    det = decode_v2(jnp.asarray(y), (416, 416))
    widths = np.asarray(det.boxes[0, 0, 0, :, 2] - det.boxes[0, 0, 0, :, 0])
    expect = np.array([a[0] for a in YOLOV2_ANCHORS]) * 32.0
    np.testing.assert_allclose(widths, expect, rtol=1e-5)


def test_decode_v1_center_offsets():
    # tx = 0 -> σ = 0.5, so bx = cx + 0.5 cells.
    y = np.zeros((1, 7, 7, 30), dtype=np.float32)
    det = decode_v1(jnp.asarray(y), (224, 224))
    centers_x = np.asarray(
        (det.boxes[0, 0, :, 0, 0] + det.boxes[0, 0, :, 0, 2]) / 2
    )
    np.testing.assert_allclose(centers_x, (np.arange(7) + 0.5) * 32, rtol=1e-5)
