"""Pallas TPU kernel: greedy NMS suppression.

The XLA path (``odc_tpu/core/nms.py``) runs the sequential suppression as a
``lax.fori_loop`` over HBM-resident arrays; this kernel keeps the whole
candidate set (scores + pairwise-IoU matrix) resident in VMEM and runs the
K-step recurrence on-chip, one grid program per image.

Layout: candidates are padded to K=128 (one full lane tile).  Box corners
arrive as four ``[B, K]`` rows; the kernel materializes the ``[K, K]`` IoU
matrix with broadcasted outer ops on the VPU, then iterates
``keep &= ~(row_i & keep_i)`` with the row selected by a one-hot matmul
(avoids dynamic value slicing).

Semantics identical to ``core.nms._suppress`` on pre-sorted candidates:
a suppressed box never suppresses others; j is dropped iff a still-kept
earlier box overlaps with IoU >= threshold (reference ``models/utils.py:
124-158``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128  # candidate tile (lane width)
IMG_TILE = 8  # images per grid program (sublane tile)


def _make_nms_body(iou_thre: float):
    def _nms_body(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref):
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        later = (j_idx > i_idx).astype(jnp.float32)
        ks = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

        for r in range(IMG_TILE):  # static unroll over the image tile
            x1 = x1_ref[r, :]  # [K]
            y1 = y1_ref[r, :]
            x2 = x2_ref[r, :]
            y2 = y2_ref[r, :]

            col = lambda v: v.reshape(K, 1)
            row = lambda v: v.reshape(1, K)

            ix1 = jnp.maximum(col(x1), row(x1))
            iy1 = jnp.maximum(col(y1), row(y1))
            ix2 = jnp.minimum(col(x2), row(x2))
            iy2 = jnp.minimum(col(y2), row(y2))
            inter = (
                jnp.clip(ix2 - ix1, 0.0, None)
                * jnp.clip(iy2 - iy1, 0.0, None)
            )
            area = (x2 - x1) * (y2 - y1)
            union = col(area) + row(area) - inter
            iou = inter / (union + 1e-6)

            sup = ((iou >= iou_thre).astype(jnp.float32)) * later

            def body(i, keep):
                # row_i = sup[i] via one-hot contraction (pure vector ops).
                onehot = (ks == i).astype(jnp.float32)  # [K, 1]
                row_i = jnp.sum(sup * onehot, axis=0)   # [K]
                keep_i = jnp.sum(keep * onehot[:, 0])   # scalar 0/1
                return keep * (1.0 - row_i * keep_i)

            keep0 = (valid_ref[r, :] > 0).astype(jnp.float32)
            keep = jax.lax.fori_loop(0, K, body, keep0)
            keep_ref[r, :] = (keep > 0.5).astype(jnp.int32)

    return _nms_body


@functools.partial(
    jax.jit, static_argnames=("iou_thre", "interpret")
)
def pallas_suppress(boxes, valid, iou_thre=0.5, interpret: bool = False):
    """boxes [B, K, 4] f32 (sorted desc by score), valid [B, K] bool ->
    keep [B, K] bool.  K must be 128; B is padded to a multiple of 8."""
    b, k, _ = boxes.shape
    assert k == K, f"pallas NMS requires K={K}, got {k}"
    pad = (-b) % IMG_TILE
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    bp = b + pad

    x1 = boxes[..., 0]
    y1 = boxes[..., 1]
    x2 = boxes[..., 2]
    y2 = boxes[..., 3]
    validf = valid.astype(jnp.int32)

    spec = pl.BlockSpec(
        (IMG_TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    keep = pl.pallas_call(
        _make_nms_body(float(iou_thre)),
        grid=(bp // IMG_TILE,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bp, K), jnp.int32),
        interpret=interpret,
    )(x1, y1, x2, y2, validf)
    return keep[:b] > 0


def nms_padded_pallas(
    boxes, conf, cls_scores, conf_thre=0.9, iou_thre=0.5,
    interpret: bool = False,
):
    """Drop-in variant of ``core.nms.nms_padded`` with max_keep=128 using
    the Pallas suppression kernel."""
    num_cls = cls_scores.shape[-1]
    boxes = boxes.reshape(-1, 4)
    conf = conf.reshape(-1)
    cls_scores = cls_scores.reshape(-1, num_cls)

    neg_inf = jnp.array(-jnp.inf, conf.dtype)
    score = jnp.where(conf >= conf_thre, conf, neg_inf)
    n = boxes.shape[0]
    if n >= K:
        top_score, order = jax.lax.top_k(score, K)
        survivors = top_score > neg_inf
    else:
        order = jnp.argsort(-score)
        survivors = jnp.take(score, order) > neg_inf
        pad = K - n
        order = jnp.pad(order, (0, pad))
        survivors = jnp.pad(survivors, (0, pad))

    cand = jnp.take(boxes, order, axis=0)
    keep = pallas_suppress(
        cand[None], survivors[None], iou_thre, interpret=interpret
    )[0]

    out_boxes = jnp.where(keep[:, None], cand, 0.0)
    out_conf = jnp.where(keep, jnp.take(conf, order), 0.0)
    out_cls = jnp.where(
        keep[:, None], jnp.take(cls_scores, order, axis=0), 0.0
    )
    return out_boxes, out_conf, out_cls, keep
