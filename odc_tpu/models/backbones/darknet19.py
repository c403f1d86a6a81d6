"""Darknet-19 backbone, NHWC.

Stage/channel structure matches the reference
(``models/backbones/darknet19.py:22-221``): seven sequential stages of
Conv+BN+LeakyReLU(0.1) with 3x3/1x1 bottlenecks and 2x2/2 max pools between
stages.  Returns both feature taps the reference exposes for YOLOv2
(``models/yolov2.py:91-190``): ``c5`` = [N, H/16, W/16, 512] after net5 and
``c7`` = [N, H/32, W/32, 1024] after net7.

ImageNet input normalization lives in-model like the reference
(``darknet19.py:262-280``) but never leaves NHWC.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from odc_tpu.models.layers import (
    ConvBnLeaky, extent_mask, imagenet_normalize, max_pool_2x2,
)

# (features, kernel) per conv within each stage; pools sit between stages.
_STAGES = (
    ((32, 3),),
    ((64, 3),),
    ((128, 3), (64, 1), (128, 3)),
    ((256, 3), (128, 1), (256, 3)),
    ((512, 3), (256, 1), (512, 3), (256, 1), (512, 3)),
    ((1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3)),
    ((1024, 3), (1024, 3)),
)


class _Stage(nn.Module):
    """One Darknet stage (consecutive ConvBnLeaky blocks).

    ``mask`` ([B, H, W, 1] bool, optional): zero the input of every k>1 conv
    beyond each image's valid extent — the native-size-parity path (see
    :func:`odc_tpu.models.layers.extent_mask`).  1x1 convs read no
    neighborhood and need no mask."""

    convs: Tuple[Tuple[int, int], ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, train: bool = False, mask=None):
        for features, k in self.convs:
            if mask is not None and k > 1:
                h = h * mask.astype(h.dtype)
            h = ConvBnLeaky(features, (k, k), dtype=self.dtype)(h, train)
        return h


class Darknet19Backbone(nn.Module):
    dtype: jnp.dtype = jnp.float32
    # Rematerialize stage activations in the backward pass (jax.checkpoint):
    # trades FLOPs for HBM, enabling larger train batches / resolutions.
    remat: bool = False

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_out=None, valid_hw=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[N, H, W, 3] RGB (0-255) -> (c5 [N,H/16,W/16,512], c7 [N,H/32,W/32,1024]).

        ``stem_out`` (inference only): a precomputed
        ``pool(stage2(pool(stage1(normalize(x)))))`` map [N, H/4, W/4, 64]
        from an external fused/quantized stem; stages 1-2 are skipped (their
        params still exist — init always runs the full path).

        ``valid_hw`` ([N, 2] int32, inference only): per-image native sizes
        for a batch PADDED to a common bucket — masked propagation makes the
        valid region of every feature map equal the image's native-size run
        (the reference evaluates v2 at native size, ``yolov2.py:666-667``).
        Extents floor-halve at each pool exactly like torch MaxPool2d."""
        if stem_out is not None and valid_hw is not None:
            raise ValueError("stem_out and valid_hw are mutually exclusive")
        stage_cls = (
            nn.remat(_Stage, static_argnums=(2,)) if self.remat else _Stage
        )
        start = 0 if stem_out is None else 2
        h = (
            imagenet_normalize(x, self.dtype)
            if stem_out is None
            else stem_out.astype(self.dtype)
        )
        eh = ew = None
        if valid_hw is not None:
            eh, ew = valid_hw[:, 0], valid_hw[:, 1]
        c5 = None
        for stage_idx, stage in enumerate(_STAGES):
            if stage_idx < start:
                continue
            # pool before stages 2..6 (reference net2-net6); stage3's
            # pre-pool is already inside a provided stem_out.
            if 1 <= stage_idx <= 5 and stage_idx != start:
                h = max_pool_2x2(h)
                if eh is not None:
                    eh, ew = eh // 2, ew // 2
            mask = (
                extent_mask(h.shape, eh, ew) if eh is not None else None
            )
            # Explicit names keep the param tree identical with/without remat.
            h = stage_cls(
                stage, dtype=self.dtype, name=f"stage{stage_idx + 1}"
            )(h, train, mask)
            if stage_idx == 4:  # after net5: [N, H/16, W/16, 512]
                c5 = h

        return c5, h
