"""Loss parity: the compact padded-target loss must reproduce the
reference's dense per-box masked-mean computation exactly.

The oracle below re-implements the reference semantics
(models/yolov1.py:556-931 / models/yolov2.py:747-1140) directly in numpy on
*dense* per-box grid maps; yolo_loss computes the same quantities from
compact [B, M] targets without ever materializing those maps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.core.boxes import iou as jiou
from odc_tpu.losses.yolo_loss import yolo_loss, Lambdas
from odc_tpu.ops.assign import assign, densify
from odc_tpu.ops.decode import decode_v1, decode_v2

HW = (64, 64)
HG = WG = 2
C = 6


def _np_iou(a, b):
    ix1 = np.maximum(a[..., 0], b[..., 0])
    iy1 = np.maximum(a[..., 1], b[..., 1])
    ix2 = np.minimum(a[..., 2], b[..., 2])
    iy2 = np.minimum(a[..., 3], b[..., 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    union = (
        (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
        + (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
        - inter
    )
    return inter / (union + 1e-6)


def _oracle(det, dense, mode, anchors=None):
    """Reference-semantics loss on dense per-box maps (numpy, f64)."""
    sig_d, twth_d, box_d, onehot_d, obj_d, img_id, valid = [
        np.asarray(t, np.float64) for t in dense
    ]
    rows = valid.astype(bool)
    sig_d, twth_d, box_d, onehot_d, obj_d = (
        sig_d[rows], twth_d[rows], box_d[rows], onehot_d[rows], obj_d[rows]
    )
    img_id = np.asarray(dense[5])[rows]

    P = {k: np.asarray(getattr(det, k), np.float64)[img_id]
         for k in ("sig_txty", "twth", "boxes", "conf", "cls_prob")}

    a = P["conf"].shape[-1]
    iou_b = _np_iou(P["boxes"], box_d[:, :, :, None, :])  # [M,Hg,Wg,A]
    resp = np.eye(a)[np.argmax(iou_b, -1)] * obj_d[..., None]
    resp_b = resp == 1
    not_resp = ~resp_b

    sq = lambda t, p: (t - p) ** 2

    loss_xy = sq(sig_d[:, :, :, None, :], P["sig_txty"])[resp_b].mean()

    if mode == "v1":
        wh_t = np.sqrt(twth_d)[:, :, :, None, :]
        wh_p = np.sqrt(P["twth"])
    else:
        pwph = np.asarray(anchors, np.float64)
        wh_t = np.sqrt(twth_d[:, :, :, None, :] / pwph)
        wh_p = np.sqrt(P["twth"])
    loss_wh = sq(wh_t, wh_p)[resp_b].mean()

    loss_conf = sq(iou_b, P["conf"])[resp_b].mean()
    loss_noobj = (P["conf"] ** 2)[not_resp].mean()

    if mode == "v1":
        # per-cell class prob, masked by obj cell (yolov1.py:914-917)
        sc = sq(onehot_d, P["cls_prob"]).sum(-1)
        loss_cls = sc[obj_d.astype(bool)].mean()
    else:
        sc = sq(onehot_d[:, :, :, None, :], P["cls_prob"]).sum(-1)
        loss_cls = sc[resp_b].mean()

    return dict(xy=loss_xy, wh=loss_wh, conf=loss_conf,
                noobj=loss_noobj, cls=loss_cls)


def _make_batch(rng, mode):
    b, m = 3, 4
    anchors = ((1.0, 1.5), (2.0, 1.0), (0.8, 0.8))
    a = len(anchors) if mode == "v2" else 2

    if mode == "v2":
        y = rng.normal(size=(b, HG, WG, a, 5 + C)).astype(np.float32)
        det = decode_v2(jnp.asarray(y), HW, anchors)
    else:
        y = rng.normal(size=(b, HG, WG, a * 5 + C)).astype(np.float32)
        det = decode_v1(jnp.asarray(y), HW, a)

    boxes = np.zeros((b, m, 4), np.float32)
    cls_idx = rng.integers(0, C, (b, m)).astype(np.int32)
    valid = np.zeros((b, m), bool)
    # image 0: 3 boxes (two sharing a cell), image 1: empty, image 2: 1 box
    boxes[0, 0] = [5, 5, 30, 30]
    boxes[0, 1] = [8, 2, 28, 33]     # same center cell as box 0
    boxes[0, 2] = [40, 40, 60, 62]
    valid[0, :3] = True
    boxes[2, 0] = [1, 33, 30, 63]
    valid[2, 0] = True

    tgt = assign(
        jnp.asarray(boxes), jnp.asarray(cls_idx), jnp.asarray(valid),
        HW, mode=mode,
    )
    return det, tgt, anchors


@pytest.mark.parametrize("mode", ["v1", "v2"])
def test_loss_matches_dense_oracle(mode):
    rng = np.random.default_rng(42)
    det, tgt, anchors = _make_batch(rng, mode)
    dense = densify(tgt, (HG, WG), C)

    oracle = _oracle(det, dense, mode, anchors)
    total, parts = yolo_loss(
        det, tgt, Lambdas(), mode=mode,
        anchors=anchors if mode == "v2" else None,
    )

    for name in ("xy", "wh", "conf", "noobj", "cls"):
        np.testing.assert_allclose(
            float(getattr(parts, name)), oracle[name],
            rtol=2e-4, err_msg=name,
        )

    lam = Lambdas()
    expect_total = (
        lam.lambda_xy * oracle["xy"] + lam.lambda_wh * oracle["wh"]
        + lam.lambda_conf * oracle["conf"]
        + lam.lambda_noobj * oracle["noobj"] + lam.lambda_cls * oracle["cls"]
    )
    np.testing.assert_allclose(float(total), expect_total, rtol=2e-4)


@pytest.mark.parametrize("mode", ["v1", "v2"])
def test_loss_grads_finite(mode):
    rng = np.random.default_rng(0)
    det, tgt, anchors = _make_batch(rng, mode)

    def f(boxes_raw):
        d = det._replace(boxes=boxes_raw)
        total, _ = yolo_loss(
            d, tgt, Lambdas(), mode=mode,
            anchors=anchors if mode == "v2" else None,
        )
        return total

    g = jax.grad(f)(det.boxes)
    assert np.all(np.isfinite(np.asarray(g)))


def test_loss_empty_batch_is_zero():
    rng = np.random.default_rng(1)
    det, tgt, anchors = _make_batch(rng, "v2")
    tgt = tgt._replace(valid=jnp.zeros_like(tgt.valid))
    total, parts = yolo_loss(det, tgt, Lambdas(), mode="v2", anchors=anchors)
    assert float(total) == 0.0
    assert all(float(p) == 0.0 for p in parts)
