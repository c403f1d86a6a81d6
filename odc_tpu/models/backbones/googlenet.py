"""GoogLeNet (Inception v1) backbone, NHWC — our own implementation.

The reference downloads pretrained torchvision weights at construction time
(``models/backbones/googlenet.py:12-14``, ``torch.hub.load('pytorch/vision
:v0.10.0', 'googlenet', pretrained=True)``) and runs a manual layer-by-layer
forward that skips avgpool/fc (``googlenet.py:32-47``), producing
[N, 7, 7, 1024] from 224x224 input.  This module reproduces that
architecture natively in JAX; ``odc_tpu/models/backbones/convert_googlenet``
can load a locally provided torchvision ``state_dict`` for weight parity.

Architecture notes (torchvision semantics, reproduced):

* ``BasicConv2d`` = Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU.
* The "5x5" inception branch actually uses a 3x3 conv (a long-standing
  torchvision quirk, kept for weight compatibility).
* All downsampling max pools are 3x3/2 with ``ceil_mode=True``.
* Convs use torch-style symmetric ``(k-1)//2`` padding.  For the stride-2
  7x7 stem conv this differs from XLA "SAME" (which would pad (2, 3));
  proven against a torch oracle in ``tests/test_convert_googlenet.py``.
* Although ``torch.hub`` with ``pretrained=True`` forces
  ``transform_input=True``, the reference never runs the hub model's own
  ``forward`` — it walks ``conv1..inception5b`` manually
  (``googlenet.py:30-47``) — so ``transform_input`` is bypassed and the
  effective normalization is exactly the reference's in-model ImageNet
  normalize (``googlenet.py:54-72``), which is what we apply.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from odc_tpu.models.layers import (
    TorchBatchNorm,
    imagenet_normalize,
    max_pool_3x3_ceil,
)


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch-style symmetric padding: differs from "SAME" for the
        # stride-2 7x7 stem conv (SAME would pad (2, 3), torch pads (3, 3)).
        kh, kw = self.kernel
        pad = ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            name="BatchNorm_0",  # keep flax auto-name: ckpt/converter compat
        )(x)
        return nn.relu(x).astype(self.dtype)


class Inception(nn.Module):
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(self.ch1x1, (1, 1), dtype=d)(x, train)

        b2 = BasicConv2d(self.ch3x3red, (1, 1), dtype=d)(x, train)
        b2 = BasicConv2d(self.ch3x3, (3, 3), dtype=d)(b2, train)

        b3 = BasicConv2d(self.ch5x5red, (1, 1), dtype=d)(x, train)
        # torchvision quirk: 3x3, not 5x5 (kept for weight compatibility)
        b3 = BasicConv2d(self.ch5x5, (3, 3), dtype=d)(b3, train)

        b4 = nn.max_pool(
            x, window_shape=(3, 3), strides=(1, 1), padding="SAME"
        )
        b4 = BasicConv2d(self.pool_proj, (1, 1), dtype=d)(b4, train)

        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


# (ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj) per inception block.
_INCEPTIONS = {
    "3a": (64, 96, 128, 16, 32, 32),
    "3b": (128, 128, 192, 32, 96, 64),
    "4a": (192, 96, 208, 16, 48, 64),
    "4b": (160, 112, 224, 24, 64, 64),
    "4c": (128, 128, 256, 24, 64, 64),
    "4d": (112, 144, 288, 32, 64, 64),
    "4e": (256, 160, 320, 32, 128, 128),
    "5a": (256, 160, 320, 32, 128, 128),
    "5b": (384, 192, 384, 48, 128, 128),
}


class GoogLeNetBackbone(nn.Module):
    """224x224 RGB -> [N, 7, 7, 1024] (reference output_shape, googlenet.py:19)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # The reference's in-model ImageNet normalize (googlenet.py:54-72);
        # transform_input is bypassed (see module docstring).
        h = imagenet_normalize(x, self.dtype)

        h = BasicConv2d(64, (7, 7), strides=(2, 2), dtype=self.dtype)(h, train)
        h = max_pool_3x3_ceil(h)
        h = BasicConv2d(64, (1, 1), dtype=self.dtype)(h, train)
        h = BasicConv2d(192, (3, 3), dtype=self.dtype)(h, train)
        h = max_pool_3x3_ceil(h)

        for name in ("3a", "3b"):
            h = Inception(*_INCEPTIONS[name], dtype=self.dtype)(h, train)
        h = max_pool_3x3_ceil(h)
        for name in ("4a", "4b", "4c", "4d", "4e"):
            h = Inception(*_INCEPTIONS[name], dtype=self.dtype)(h, train)
        h = max_pool_3x3_ceil(h)
        for name in ("5a", "5b"):
            h = Inception(*_INCEPTIONS[name], dtype=self.dtype)(h, train)

        return h
