"""YOLOv2 network + decode glue.

Network (reference ``models/yolov2.py:41-431``): Darknet-19 with two taps
(c5 [N,H/16,W/16,512], c7 [N,H/32,W/32,1024]) -> passthrough neck ->
Conv3x3(3072->1024)+BN+LeakyReLU(0.1) -> Conv1x1(->A*(5+C)) -> reshape
[N, Hg, Wg, A, 5+C] with the 5 hardcoded anchors (``yolov2.py:49-55``).

The reference's neck is **quadrant stacking**, not the paper's
space-to-depth reorg (SURVEY.md note A, ``yolov2.py:254-301``): it
concatenates the left/right halves then top/bottom halves of the c5 map onto
channels, so the 2048 passthrough channels are the TL/TR/BL/BR *quadrants*
at 13x13.  We reproduce that by default and expose the paper-correct
``space_to_depth`` variant as a flag.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from odc_tpu.models.backbones.darknet19 import Darknet19Backbone
from odc_tpu.models.layers import ConvBnLeaky, extent_mask
from odc_tpu.ops.decode import decode_v2, Detections, YOLOV2_ANCHORS


def quadrant_stack(h1: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H//2, W//2, 4C] with channel blocks = TL/TR/BL/BR
    quadrants (reference yolov2.py:254-301 semantics, NHWC).  Odd trailing
    rows/cols are dropped, exactly like the reference's ``[i*W2 : i*W2+W2]``
    slices (native-size v2 inference hits odd dims, yolov2.py:666-667)."""
    _, hh, ww, _ = h1.shape
    h, w = hh // 2, ww // 2
    left, right = h1[:, :, :w, :], h1[:, :, w : 2 * w, :]
    hw = jnp.concatenate([left, right], axis=-1)  # [N, H, w, 2C]
    top, bottom = hw[:, :h, :, :], hw[:, h : 2 * h, :, :]
    return jnp.concatenate([top, bottom], axis=-1)  # [N, h, w, 4C]


def quadrant_stack_dynamic(h1: jnp.ndarray, e16h, e16w) -> jnp.ndarray:
    """Per-image quadrant reorg for a PADDED batch: each image's quadrant
    split sits at ITS native half extents (``e16h//2``, ``e16w//2``), not
    the bucket's — the reference's quadrant slices are relative to the
    native c5 map (``models/yolov2.py:254-301``), so a padded batch must
    gather TL/TR/BL/BR from per-image offsets.  Values beyond each image's
    quadrant extent are junk and must be masked downstream."""
    b, hh, ww, c = h1.shape
    qh, qw = e16h // 2, e16w // 2  # [B]

    def one(img, qh_i, qw_i):
        def grab(dy, dx):
            return jax.lax.dynamic_slice(
                img, (dy, dx, 0), (hh // 2, ww // 2, c)
            )

        zero = jnp.zeros((), jnp.int32)
        return jnp.concatenate(
            [grab(zero, zero), grab(zero, qw_i), grab(qh_i, zero),
             grab(qh_i, qw_i)],
            axis=-1,
        )

    return jax.vmap(one)(h1, qh.astype(jnp.int32), qw.astype(jnp.int32))


def space_to_depth(h1: jnp.ndarray) -> jnp.ndarray:
    """Paper-style stride-2 reorg: [N, 2h, 2w, C] -> [N, h, w, 4C]."""
    n, hh, ww, c = h1.shape
    h, w = hh // 2, ww // 2
    h1 = h1[:, : 2 * h, : 2 * w, :].reshape(n, h, 2, w, 2, c)
    h1 = h1.transpose(0, 1, 3, 2, 4, 5)
    return h1.reshape(n, h, w, 4 * c)


class YOLOv2(nn.Module):
    num_cls: int = 20
    anchors: Tuple[Tuple[float, float], ...] = YOLOV2_ANCHORS
    neck: str = "quadrant"  # "quadrant" (reference parity) | "space_to_depth"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # jax.checkpoint the backbone stages (memory vs FLOPs)

    image_size: Tuple[int, int] = (416, 416)

    @property
    def num_anchor_box(self) -> int:
        return len(self.anchors)

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_out=None, neck_override=None,
        valid_hw=None,
    ):
        """[N, H, W, 3] RGB (0-255) -> raw head [N, Hg, Wg, A, 5 + C].

        ``stem_out`` / ``neck_override`` are inference-only hooks for fused
        or quantized replacements of the stem stages / the 3x3 neck conv
        (see ``odc_tpu.ops.quantize``); init always runs the plain path so
        the param tree is identical.

        ``valid_hw`` ([N, 2] int32, inference only): native per-image sizes
        for a padded batch — the masked native-size-parity path (cells
        [:h//32, :w//32] of the output equal the image's native-size run;
        everything beyond is junk the caller must mask, see
        ``odc_tpu.ops.detect.make_native_infer_fn``)."""
        a = self.num_anchor_box
        out_dim = a * (5 + self.num_cls)
        if valid_hw is not None and (train or neck_override is not None):
            raise ValueError(
                "valid_hw is an inference-only path (no train/neck_override)"
            )

        c5, c7 = Darknet19Backbone(dtype=self.dtype, remat=self.remat)(
            x, train, stem_out=stem_out, valid_hw=valid_hw
        )

        if valid_hw is None:
            reorg = (
                quadrant_stack if self.neck == "quadrant" else space_to_depth
            )
            h = jnp.concatenate([reorg(c5), c7], axis=-1)  # [N,Hg,Wg,3072]
        else:
            e16h, e16w = valid_hw[:, 0] // 16, valid_hw[:, 1] // 16
            if self.neck == "quadrant":
                p = quadrant_stack_dynamic(c5, e16h, e16w)
            else:
                # space_to_depth is block-local (translation-invariant under
                # top-left-aligned padding); the static reorg is exact.
                p = space_to_depth(c5)
            h = jnp.concatenate([p, c7], axis=-1)
            # Mask before the 3x3 neck conv: valid grid = (h//32, w//32).
            h = h * extent_mask(h.shape, e16h // 2, e16w // 2).astype(h.dtype)

        neck_conv = ConvBnLeaky(1024, (3, 3), dtype=self.dtype)
        if neck_override is not None and not train:
            h = neck_override(h)
        else:
            h = neck_conv(h, train)
        y = nn.Conv(
            out_dim, (1, 1), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(h)

        n, hg, wg, _ = y.shape
        return y.reshape(n, hg, wg, a, 5 + self.num_cls).astype(jnp.float32)

    def decode(self, y, image_hw=None) -> Detections:
        return decode_v2(y, image_hw or self.image_size, self.anchors)
