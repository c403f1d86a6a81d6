"""YOLOv3 network + decode glue.

Capability EXTENSION, not reference parity: the reference repo ships a
Darknet-53 backbone but never attaches a model to it ("YOLOv3 never
built", ``models/backbones/darknet53.py:127-283`` — the backbone is dead
code there).  This module completes the collection with the paper's
architecture (Redmon & Farhadi, "YOLOv3: An Incremental Improvement",
2018), TPU-first: NHWC, bf16 MXU convs, static shapes, nearest-neighbor
upsampling via ``jnp.repeat`` (no gathers).

Structure: Darknet-53 taps c3/c4/c5 (strides 8/16/32) -> per-scale
5-conv blocks (1x1/3x3 alternating) with top-down feature passing (1x1
reduce -> 2x nearest upsample -> channel concat) -> a 3x3 + 1x1 head per
scale emitting ``[N, Hg, Wg, 3, 5 + C]``.  Class outputs are independent
sigmoids (multi-label), anchors are 9 pixel-space priors split across
scales — both per the paper, and both deliberately different from the
reference's v1/v2 softmax heads.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from odc_tpu.models.backbones.darknet53 import Darknet53Backbone
from odc_tpu.models.layers import ConvBnLeaky, TorchBatchNorm
from odc_tpu.ops.decode import decode_v3, Detections, YOLOV3_ANCHORS


def upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, 2H, 2W, C] nearest-neighbor (pure repeats —
    XLA lowers this to a broadcast+reshape, no gather on TPU)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _FiveConv(nn.Module):
    """The paper's per-scale block: 1x1(f) 3x3(2f) 1x1(f) 3x3(2f) 1x1(f).

    ``first=False`` drops the leading 1x1 (it was computed by
    :class:`_LateralMerge` on the fused top-down path)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    first: bool = True
    int8_dynamic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        layers = (((1, 1), f), ((3, 3), 2 * f), ((1, 1), f), ((3, 3), 2 * f),
                  ((1, 1), f))
        for k, ff in layers if self.first else layers[1:]:
            x = ConvBnLeaky(
                ff, k, dtype=self.dtype, int8_dynamic=self.int8_dynamic,
            )(x, train)
        return x


class _LateralMerge(nn.Module):
    """Top-down merge + the per-scale block's first 1x1, fused EXACTLY.

    A 1x1 conv is pointwise and nearest upsampling is a repeat, so they
    commute::

        conv1x1(concat([upsample2(r), c])) == upsample2(conv_r(r)) + conv_c(c)

    (the concat kernel splits row-wise into ``W_r``/``W_c``; same sums, so
    identical up to float reassociation).  The TPU payoff, measured in
    PROFILE.md "YOLOv3 per-stage roofline": the r-branch matmul runs at the
    COARSE resolution (4x fewer MACs) and the [N, 2H, 2W, Cr+Cc] concat —
    the widest tensor of each FPN stage — is never materialized in HBM.
    BN + leaky apply to the sum, which has identical statistics to the
    concat formulation's conv output."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, r, c, train: bool = False):
        conv = dict(padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)
        zr = nn.Conv(self.features, (1, 1), use_bias=True, **conv)(r)
        zc = nn.Conv(self.features, (1, 1), use_bias=False, **conv)(c)
        z = upsample2(zr) + zc
        z = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
        )(z)
        return nn.leaky_relu(z, 0.1).astype(self.dtype)


class YOLOv3(nn.Module):
    num_cls: int = 20
    anchors: Tuple[Tuple[float, float], ...] = YOLOV3_ANCHORS  # pixels
    dtype: jnp.dtype = jnp.float32
    image_size: Tuple[int, int] = (416, 416)
    # Fuse each top-down merge's upsample+concat+1x1 via _LateralMerge
    # (exact up to float reassociation; the default).  False keeps the
    # paper-literal concat formulation — same math, more HBM traffic —
    # used by tests/test_yolov3.py::test_lateral_merge_exactness and the
    # PROFILE.md A/B.
    fused_lateral: bool = True
    # Serving-time dynamic int8 for every 3x3 with >=128 input channels
    # (backbone b3-b5, FPN five-convs, head 3x3s) — measured 2116 -> see
    # PROFILE.md "int8 on YOLOv3's shapes".  Same params as bf16; ignored
    # during training.
    int8_dynamic: bool = False

    @property
    def num_anchor_box(self) -> int:
        return 3  # per scale; 9 anchors total across the 3 heads

    @nn.compact
    def __call__(self, x, train: bool = False, stop_after=None):
        """[N, H, W, 3] RGB (0-255), H/W multiples of 32 (>= 64) ->
        (y32, y16, y8): per-scale raw heads [N, Hg, Wg, 3, 5 + num_cls],
        coarsest first (matching ``decode_v3``'s anchor-group order).

        ``stop_after`` (profiling probe, apply-only): ``"stem"``/``"b1"``..
        ``"b5"`` (backbone blocks), ``"p5"``/``"y32"``/``"p4"``/``"y16"``/
        ``"p3"`` — truncate the program there (prefix-timing methodology,
        PROFILE.md).  Probes past the first head return CUMULATIVE tuples
        (earlier heads included) so each prefix is a strict superset of the
        previous one — otherwise XLA dead-code-eliminates the already-timed
        heads and adjacent diffs subtract them back out."""
        a = self.num_anchor_box
        out_dim = a * (5 + self.num_cls)
        # SAME-padded downsamples (exact stride-8/16/32 taps): the
        # reference backbone's VALID quirk misaligns the FPN concat at
        # every input size — see Darknet53Backbone.downsample_padding.
        if stop_after in ("stem", "b1", "b2", "b3", "b4", "b5"):
            return Darknet53Backbone(
                dtype=self.dtype, downsample_padding="SAME",
                int8_dynamic=self.int8_dynamic,
            )(x, train, stop_after=stop_after)
        c3, c4, c5 = Darknet53Backbone(
            dtype=self.dtype, downsample_padding="SAME",
            int8_dynamic=self.int8_dynamic,
        )(x, train)

        def head(h):
            h = ConvBnLeaky(
                2 * h.shape[-1], (3, 3), dtype=self.dtype,
                int8_dynamic=self.int8_dynamic,
            )(h, train)
            y = nn.Conv(
                out_dim, (1, 1), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(h)
            n, hg, wg, _ = y.shape
            return y.reshape(n, hg, wg, a, 5 + self.num_cls).astype(
                jnp.float32
            )

        p5 = _FiveConv(
            512, dtype=self.dtype, int8_dynamic=self.int8_dynamic,
        )(c5, train)
        if stop_after == "p5":
            return p5
        y32 = head(p5)
        if stop_after == "y32":
            return y32

        t4 = ConvBnLeaky(256, (1, 1), dtype=self.dtype)(p5, train)
        if self.fused_lateral:
            m4 = _LateralMerge(256, dtype=self.dtype)(t4, c4, train)
            p4 = _FiveConv(
                256, dtype=self.dtype, first=False,
                int8_dynamic=self.int8_dynamic,
            )(m4, train)
        else:
            p4 = _FiveConv(
                256, dtype=self.dtype, int8_dynamic=self.int8_dynamic,
            )(jnp.concatenate([upsample2(t4), c4], axis=-1), train)
        if stop_after == "p4":
            return y32, p4
        y16 = head(p4)
        if stop_after == "y16":
            return y32, y16

        t3 = ConvBnLeaky(128, (1, 1), dtype=self.dtype)(p4, train)
        if self.fused_lateral:
            m3 = _LateralMerge(128, dtype=self.dtype)(t3, c3, train)
            p3 = _FiveConv(
                128, dtype=self.dtype, first=False,
                int8_dynamic=self.int8_dynamic,
            )(m3, train)
        else:
            p3 = _FiveConv(
                128, dtype=self.dtype, int8_dynamic=self.int8_dynamic,
            )(jnp.concatenate([upsample2(t3), c3], axis=-1), train)
        if stop_after == "p3":
            return y32, y16, p3
        y8 = head(p3)

        return y32, y16, y8

    def decode(self, y, image_hw=None) -> Detections:
        return decode_v3(y, image_hw or self.image_size, self.anchors)
