"""Darknet-53 backbone, NHWC.

Capability-parity port target: the reference ships this backbone unused
(``models/backbones/darknet53.py:127-283``, never imported by a model — a
YOLOv3 was never built); we provide it so a future YOLOv3 head can attach.

Structure (reference ``darknet53.py:131-226``): a 3x3 stem, then five
stride-2 3x3 downsampling convs each followed by N residual bottleneck
blocks (1x1 reduce -> 3x3 expand, additive skip) with N = 1, 2, 8, 8, 4.
Stride-2 convs use VALID padding like the reference's ``padding="valid"``
(``darknet53.py:26``), so spatial dims follow floor((s-2)/2)+1.
The reference's leftover debug prints (``darknet53.py:235-261``) are not
reproduced.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from odc_tpu.models.layers import ConvBnLeaky, imagenet_normalize


class _Residual(nn.Module):
    """1x1 reduce -> 3x3 expand -> add skip (reference ConvAndResidualLayer)."""

    reduce_features: int
    features: int
    dtype: jnp.dtype = jnp.float32
    int8_dynamic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBnLeaky(self.reduce_features, (1, 1), dtype=self.dtype)(x, train)
        h = ConvBnLeaky(
            self.features, (3, 3), dtype=self.dtype,
            int8_dynamic=self.int8_dynamic,
        )(h, train)
        return h + x


_BLOCKS = (  # (downsample_features, repeat)
    (64, 1),
    (128, 2),
    (256, 8),
    (512, 8),
    (1024, 4),
)


class Darknet53Backbone(nn.Module):
    dtype: jnp.dtype = jnp.float32
    # The reference's stride-2 convs use padding="valid"
    # (darknet53.py:26), which does NOT halve dims exactly
    # (floor((s-3)/2)+1) — its taps can never feed an upsample+concat
    # FPN, consistent with the backbone being dead code there.  "VALID"
    # stays the parity default; YOLOv3 passes "SAME" (the actual darknet
    # pad=1 behavior: exact halving for even sizes, aligned taps).
    downsample_padding: str = "VALID"
    # Serving-time dynamic int8 for the wide 3x3s (>=128 input channels);
    # see ConvBnLeaky.int8_dynamic.  Same params either way.
    int8_dynamic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, stop_after=None):
        """[N, H, W, 3] RGB (0-255) -> final feature map [N, h, w, 1024].

        Also returns the c4 (512-ch) and c3 (256-ch) taps a YOLOv3-style
        FPN head would consume.

        ``stop_after`` (profiling probe, apply-only): ``"stem"`` or
        ``"b1"``..``"b5"`` truncates the program after that block and
        returns the intermediate — prefix-timing diffs of the REAL
        compiled program are the only trustworthy per-stage costs
        (PROFILE.md round-4 profiling lessons)."""
        h = imagenet_normalize(x, self.dtype)
        h = ConvBnLeaky(32, (3, 3), dtype=self.dtype)(h, train)
        if stop_after == "stem":
            return h

        taps = {}
        for bi, (features, repeat) in enumerate(_BLOCKS):
            h = ConvBnLeaky(
                features, (3, 3), strides=(2, 2),
                padding=self.downsample_padding,
                dtype=self.dtype,
                int8_dynamic=self.int8_dynamic,
            )(h, train)
            for _ in range(repeat):
                h = _Residual(
                    features // 2, features, dtype=self.dtype,
                    int8_dynamic=self.int8_dynamic,
                )(h, train)
            taps[features] = h
            if stop_after == f"b{bi + 1}":
                return h

        return taps[256], taps[512], taps[1024]
