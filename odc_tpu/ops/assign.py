"""Target assignment (grid-cell, v1 and v2 flavors).

The reference assigner (``models/yolov1.py:1178-1355``,
``models/yolov2.py:1392-1555``) runs a Python loop per ground-truth box and
materializes *dense* per-box grid maps ``[num_bbox, Hg, Wg, ...]`` — ragged
across batches (``num_bbox`` varies) and hugely redundant (every map is
zero except one cell).

TPU-first redesign: targets are **compact padded** tensors ``[B, MAX_BOXES,
...]`` with a validity mask.  Each box stores exactly the values the
reference writes into its one active cell:

* ``cell`` (cy, cx) — ``int(by), int(bx)`` truncation (yolov1.py:1276-1277)
* ``sig_txty`` — center offset within the cell (yolov1.py:1279-1280)
* ``twth`` — v1: ``(bw/Wg, bh/Hg)`` sigmoid-space size (yolov1.py:1281-1282);
  v2: ``(bw, bh)`` in grid units (yolov2.py:1475-1476)
* ``box`` — raw pixel corners, ``cls`` — class index.

The dense reference layout is recoverable via :func:`densify` (used by the
golden parity tests and available for users of the reference contract).

Two implementations with identical semantics:

* :func:`assign_numpy` — host, float64 arithmetic in the reference's exact
  operation order, then cast to float32 ⇒ **bitwise-stable** vs the
  reference assigner (the parity gate in BASELINE.md).
* :func:`assign` — device, float32, fully vectorized/jittable (runs fused
  inside the train step; no host round-trip).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class YoloTargets(NamedTuple):
    cell: jax.Array      # [B, M, 2] int32 (cy, cx)
    sig_txty: jax.Array  # [B, M, 2] f32
    twth: jax.Array      # [B, M, 2] f32 (v1: sig-space wh; v2: grid-unit wh)
    box: jax.Array       # [B, M, 4] f32 pixel corners (x1, y1, x2, y2)
    cls: jax.Array       # [B, M] int32
    valid: jax.Array     # [B, M] bool


def _split_wh(mode: str):
    # "v3" produces v2-shaped compact targets: YOLOv3's real assignment
    # (best anchor of 9 across 3 scales) is re-derived on device inside
    # odc_tpu.losses.yolov3_loss from box/cls/valid alone — the stride-32
    # cell/sig_txty/twth fields here are simply unused by the v3 loss.
    if mode not in ("v1", "v2", "v3"):
        raise ValueError(f"mode must be 'v1', 'v2' or 'v3', got {mode!r}")


def assign(
    boxes: jax.Array,
    cls_idx: jax.Array,
    valid: jax.Array,
    image_hw: Tuple[int, int],
    mode: str = "v2",
) -> YoloTargets:
    """Vectorized on-device assigner.

    Args:
        boxes: [B, M, 4] pixel corners (padded; junk where ``~valid``).
        cls_idx: [B, M] int32 class indices.
        valid: [B, M] bool.
        image_hw: static (H, W); grid is (H//32, W//32) (yolov1.py:1232-1233).
        mode: "v1" (sigmoid-space wh) or "v2" (grid-unit wh).
    """
    _split_wh(mode)
    h, w = image_hw
    hg, wg = h // 32, w // 32
    # Like the reference, cell size is H/(H//32) (yolov1.py:1235-1236) —
    # exactly 32.0 for multiples of 32 but kept general.
    cell_h = h / hg
    cell_w = w / wg

    x1 = boxes[..., 0] / cell_w
    y1 = boxes[..., 1] / cell_h
    x2 = boxes[..., 2] / cell_w
    y2 = boxes[..., 3] / cell_h

    bx = (x1 + x2) / 2
    by = (y1 + y2) / 2
    bw = x2 - x1
    bh = y2 - y1

    # int() truncation in the reference; clipped to the grid for safety on
    # padded/degenerate entries.
    cx = jnp.clip(bx.astype(jnp.int32), 0, wg - 1)
    cy = jnp.clip(by.astype(jnp.int32), 0, hg - 1)

    sig_tx = bx - cx.astype(bx.dtype)
    sig_ty = by - cy.astype(by.dtype)

    if mode == "v1":
        twth = jnp.stack([bw / wg, bh / hg], axis=-1)
    else:
        twth = jnp.stack([bw, bh], axis=-1)

    return YoloTargets(
        cell=jnp.stack([cy, cx], axis=-1),
        sig_txty=jnp.stack([sig_tx, sig_ty], axis=-1).astype(jnp.float32),
        twth=twth.astype(jnp.float32),
        box=boxes.astype(jnp.float32),
        cls=cls_idx.astype(jnp.int32),
        valid=valid,
    )


def assign_numpy(
    bbox_list,
    cls_idx_list,
    image_hw: Tuple[int, int],
    mode: str = "v2",
    max_boxes: int = 64,
):
    """Host assigner for one image: float64 in the reference op order, cast
    to float32 at the end (mirrors ``torch.tensor(np.float64).float()``,
    yolov1.py:1301-1305) ⇒ bitwise-stable vs the reference.

    Returns numpy arrays shaped like one row of :class:`YoloTargets`
    (``[max_boxes, ...]``).
    """
    _split_wh(mode)
    h, w = image_hw
    hg, wg = h // 32, w // 32
    cell_h = h / hg
    cell_w = w / wg

    cell = np.zeros((max_boxes, 2), np.int32)
    sig_txty = np.zeros((max_boxes, 2), np.float64)
    twth = np.zeros((max_boxes, 2), np.float64)
    box = np.zeros((max_boxes, 4), np.float64)
    cls = np.zeros((max_boxes,), np.int32)
    valid = np.zeros((max_boxes,), bool)

    n = min(len(bbox_list), max_boxes)
    for i in range(n):
        x1, y1, x2, y2 = bbox_list[i]
        # Reference op order (yolov1.py:1266-1282 / yolov2.py:1468-1487).
        x1n = x1 / cell_w
        y1n = y1 / cell_h
        x2n = x2 / cell_w
        y2n = y2 / cell_h
        bx = (x1n + x2n) / 2
        by = (y1n + y2n) / 2
        bw = x2n - x1n
        bh = y2n - y1n
        cx = int(bx)
        cy = int(by)

        cell[i] = (cy, cx)
        sig_txty[i] = (bx - cx, by - cy)
        if mode == "v1":
            twth[i] = (bw / wg, bh / hg)
        else:
            twth[i] = (bw, bh)
        box[i] = (x1, y1, x2, y2)
        cls[i] = cls_idx_list[i]
        valid[i] = True

    return (
        cell,
        sig_txty.astype(np.float32),
        twth.astype(np.float32),
        box.astype(np.float32),
        cls,
        valid,
    )


def densify(targets: YoloTargets, grid_hw: Tuple[int, int], num_cls: int):
    """Materialize the reference's dense per-box contract (SURVEY.md §3.5).

    Returns, with ``M_total = B*M`` (invalid rows are all-zero maps exactly
    like a reference map for a box that was never written):
        sig_txty  [M_total, Hg, Wg, 2]
        twth      [M_total, Hg, Wg, 2]
        box       [M_total, Hg, Wg, 4]
        cls_onehot[M_total, Hg, Wg, C]
        obj_mask  [M_total, Hg, Wg]
        img_id    [M_total]  (row index into the batch)
        valid     [M_total]
    """
    hg, wg = grid_hw
    b, m = targets.valid.shape

    def one(cell, sig_txty, twth, box, cls, valid):
        cy, cx = cell[0], cell[1]
        hot = (
            (jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0) == cy)
            & (jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1) == cx)
            & valid
        )
        hotf = hot.astype(jnp.float32)
        return (
            hotf[..., None] * sig_txty,
            hotf[..., None] * twth,
            hotf[..., None] * box,
            hotf[..., None] * jax.nn.one_hot(cls, num_cls),
            hotf,
        )

    flat = jax.tree.map(lambda t: t.reshape((b * m,) + t.shape[2:]), targets)
    dense = jax.vmap(one)(
        flat.cell, flat.sig_txty, flat.twth, flat.box, flat.cls, flat.valid
    )
    img_id = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)
    return dense + (img_id, flat.valid)
