"""Pure box math (corner-format IoU, coordinate transforms).

Semantics match the reference's ``models/utils.py:5-65`` (``get_iou``):
intersection uses ``clamp(min=0)`` on both extents, union adds the two raw
(un-clamped) areas and subtracts the intersection, and the denominator gets a
``+1e-6`` stabilizer.  All functions are pure ``jax.numpy`` and shape-
polymorphic over leading batch dims, so they jit/vmap/grad cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def iou(coord1, coord2):
    """Broadcast corner-format IoU.

    Args:
        coord1: [..., 4] boxes as (x1, y1, x2, y2).
        coord2: [..., 4] boxes, broadcast-compatible with ``coord1``.

    Returns:
        [...] IoU, with the reference's ``+1e-6`` union stabilizer
        (reference ``models/utils.py:63``).
    """
    x1, y1, x2, y2 = (coord1[..., i] for i in range(4))
    x1h, y1h, x2h, y2h = (coord2[..., i] for i in range(4))

    ix1 = jnp.maximum(x1, x1h)
    iy1 = jnp.maximum(y1, y1h)
    ix2 = jnp.minimum(x2, x2h)
    iy2 = jnp.minimum(y2, y2h)

    intersection = jnp.clip(ix2 - ix1, min=0) * jnp.clip(iy2 - iy1, min=0)

    union = (
        (x2 - x1) * (y2 - y1)
        + (x2h - x1h) * (y2h - y1h)
        - intersection
    )

    return intersection / (union + 1e-6)


def pairwise_iou(boxes1, boxes2):
    """All-pairs IoU: boxes1 [N, 4] x boxes2 [M, 4] -> [N, M]."""
    return iou(boxes1[:, None, :], boxes2[None, :, :])


def xyxy_to_cxcywh(boxes):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def cxcywh_to_xyxy(boxes):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
