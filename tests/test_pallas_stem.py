"""Fused stem kernel vs the XLA reference stem (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from odc_tpu.models.layers import imagenet_normalize
from odc_tpu.ops.pallas.stem_kernel import stem_conv_pool, fold_bn


def _ref_stem(x, kernel, cbias, gs, gb, mu, var):
    xn = imagenet_normalize(x, jnp.bfloat16)
    h = jax.lax.conv_general_dilated(
        xn, kernel.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    h = h + cbias
    h = (h - mu) / jnp.sqrt(var + 1e-5) * gs + gb
    h = jnp.where(h > 0, h, 0.1 * h)
    return nn.max_pool(h.astype(jnp.bfloat16), (2, 2), (2, 2))


@pytest.mark.parametrize("hw", [(64, 64), (96, 128)])
def test_stem_kernel_matches_xla(hw):
    rng = np.random.default_rng(0)
    h, w = hw
    x = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 32)), jnp.float32)
    cbias = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    gs = jnp.asarray(rng.uniform(0.5, 1.5, 32), jnp.float32)
    gb = jnp.asarray(rng.normal(0, 0.1, 32), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.1, 32), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 32), jnp.float32)

    w_ct = fold_bn(kernel, cbias, gs, gb, mu, var)
    ours = stem_conv_pool(x, w_ct, interpret=True)
    ref = _ref_stem(x, kernel, cbias, gs, gb, mu, var)

    assert ours.shape == ref.shape == (2, h // 2, w // 2, 32)
    d = np.abs(np.asarray(ours, np.float32) - np.asarray(ref, np.float32))
    # bf16-rounding tolerance (folded vs sequential BN arithmetic).
    assert d.max() <= 0.05, d.max()
