"""Shared NHWC building blocks.

All convolutions run in NHWC with a configurable compute dtype (bfloat16 on
TPU keeps the MXU fed at full rate; parameters stay float32).  BatchNorm
statistics are always accumulated in float32.

The Conv+BN+LeakyReLU(0.1) block mirrors the reference's ubiquitous stack
(e.g. ``models/backbones/darknet19.py:22-31``); like the reference we keep
the (redundant) conv bias so parameter surfaces match.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet statistics used by every reference backbone's in-model normalize
# (darknet19.py:262-280, googlenet.py:54-72, darknet53.py:265-283).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8/float RGB [N, H, W, 3] -> normalized float, staying NHWC.

    (The reference then permutes to NCHW for cuDNN; on TPU NHWC is the
    native layout, so no transpose exists anywhere in this framework.)
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    x = (x.astype(jnp.float32) / 255.0 - mean) / std
    return x.astype(dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``BatchNorm2d`` running-stat semantics.

    Identical to ``flax.linen.BatchNorm`` (same param/stat names, so
    checkpoints and the torch converters are unaffected) except for one
    detail that flax gets differently: torch updates ``running_var`` with
    the **unbiased** batch variance (``n/(n-1)`` correction) while
    normalizing with the biased one.  flax uses the biased variance for
    both, which makes multi-step training drift away from a torch model
    sharing the same weights — this module reproduces torch exactly so the
    training-dynamics parity suite can compare running stats bitwise-ish
    (see ``tests/test_train_parity.py``; reference models all go through
    ``torch.nn.BatchNorm2d``, e.g. ``models/backbones/darknet19.py:23``).
    """

    use_running_average: bool
    momentum: float = 0.9  # decay; torch momentum = 1 - decay
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (feat,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (feat,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                bessel = n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var * bessel
                )

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ConvBnLeaky(nn.Module):
    """Conv (SAME) + BatchNorm + LeakyReLU(0.1).

    ``int8_dynamic`` (inference-only serving option): run the conv on the
    MXU's int8 path — weights symmetric per-out-channel, activations
    per-tensor dynamic, int32 accumulation, dequant before the exact BN
    affine (the ``ops/quantize.py`` scheme).  Gated in-module to the shapes
    where int8 measurably wins on v5e (3x3 kernels with >=128 input
    channels — PROFILE.md "int8 on YOLOv3's shapes": 0.70-0.85x of the
    bf16 time there, a LOSS at narrow/small-K shapes).  Ignored during
    training and init; the same params serve both precisions, so any bf16
    checkpoint deploys quantized with no conversion."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    negative_slope: float = 0.1
    use_bias: bool = True  # torch Conv2d default; reference keeps it
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32
    int8_dynamic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_int8 = (
            self.int8_dynamic and not train and not self.is_initializing()
            and tuple(self.kernel) == (3, 3) and x.shape[-1] >= 128
        )
        if use_int8:
            from odc_tpu.ops.quantize import (
                quantize_dynamic, quantize_weights_per_channel,
            )

            p = self.variables["params"]["Conv_0"]
            xq, sx = quantize_dynamic(x)
            wq, sw = quantize_weights_per_channel(p["kernel"])
            dn = jax.lax.conv_dimension_numbers(
                xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
            )
            acc = jax.lax.conv_general_dilated(
                xq, wq, self.strides, self.padding,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            x = acc.astype(jnp.float32) * (sx * sw)
            if self.use_bias:
                x = x + p["bias"].astype(jnp.float32)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=self.padding,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
            )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch BatchNorm2d momentum=0.1 <=> decay 0.9
            epsilon=1e-5,
            name="BatchNorm_0",  # keep flax auto-name: ckpt/converter compat
        )(x)
        return nn.leaky_relu(x, self.negative_slope).astype(self.dtype)


def extent_mask(shape, eh, ew):
    """Per-image valid-extent mask for a padded NHWC batch.

    Args:
        shape: the [B, H, W, C] batch shape.
        eh, ew: [B] int32 valid extents (rows/cols < extent are valid).
    Returns:
        [B, H, W, 1] bool — True inside each image's valid region.

    Zeroing beyond the extents before every k>1 conv makes a
    padded-to-bucket forward bitwise-equivalent (up to reduction order) to
    running each image at its NATIVE size with SAME zero padding: border
    windows read zeros exactly where the native run's implicit conv padding
    would be, and floor-pooling arithmetic (``extent // 2``) reproduces the
    reference's odd-dimension drops (``models/yolov2.py:666-667``).
    """
    b, h, w, _ = shape
    rm = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1) < eh[:, None]
    cm = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) < ew[:, None]
    return (rm[:, :, None] & cm[:, None, :])[..., None]


def max_pool_2x2(x):
    """2x2/2 max pool (reference MaxPool2d between Darknet stages)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def max_pool_3x3_ceil(x):
    """3x3/2 max pool with ceil_mode=True (torchvision GoogLeNet pools)."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((0, 1), (0, 1))
    )
