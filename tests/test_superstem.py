"""Numeric parity of the fused superstem Pallas kernel (interpret mode on
CPU) against the plain XLA stem — normalize + conv1/BN/leaky + pool +
conv2/BN/leaky + pool.  The kernel is an engineering record (slower than
XLA on the current libtpu, see PROFILE.md), but its math must stay exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from odc_tpu.models.layers import ConvBnLeaky, imagenet_normalize, max_pool_2x2
from odc_tpu.ops.pallas.superstem_kernel import fold_weights, superstem


class StemRegion(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = imagenet_normalize(x, self.dtype)
        h = ConvBnLeaky(32, (3, 3), dtype=self.dtype)(h, False)
        h = max_pool_2x2(h)
        h = ConvBnLeaky(64, (3, 3), dtype=self.dtype)(h, False)
        h = max_pool_2x2(h)
        return h


def _folded(v):
    c1p = v["params"]["ConvBnLeaky_0"]
    c1s = v["batch_stats"]["ConvBnLeaky_0"]
    c2p = v["params"]["ConvBnLeaky_1"]
    c2s = v["batch_stats"]["ConvBnLeaky_1"]
    return fold_weights(
        c1p["Conv_0"]["kernel"], c1p["Conv_0"]["bias"],
        c1p["BatchNorm_0"]["scale"], c1p["BatchNorm_0"]["bias"],
        c1s["BatchNorm_0"]["mean"], c1s["BatchNorm_0"]["var"],
        c2p["Conv_0"]["kernel"], c2p["Conv_0"]["bias"],
        c2p["BatchNorm_0"]["scale"], c2p["BatchNorm_0"]["bias"],
        c2s["BatchNorm_0"]["mean"], c2s["BatchNorm_0"]["var"],
    )


@pytest.mark.parametrize("hw", [(64, 64), (96, 416)])
def test_superstem_matches_xla_stem(hw):
    rng = np.random.default_rng(0)
    h, w = hw
    x = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    m = StemRegion()
    v = m.init(jax.random.key(0), x[:1])
    # randomize BN running stats so the folding is non-trivial
    p = jax.tree.map(np.asarray, v)
    for blk in ("ConvBnLeaky_0", "ConvBnLeaky_1"):
        st = p["batch_stats"][blk]["BatchNorm_0"]
        st["mean"] = rng.normal(0, 0.2, st["mean"].shape).astype(np.float32)
        st["var"] = rng.uniform(0.5, 1.5, st["var"].shape).astype(np.float32)
    v = jax.tree.map(jnp.asarray, p)

    ref = np.asarray(m.apply(v, x)).astype(np.float32)
    w1, w2 = _folded(v)
    got = np.asarray(superstem(x, w1, w2, interpret=True)).astype(np.float32)
    assert got.shape == (2, h // 4, w // 4, 64)
    # bf16-rounding-level agreement (intermediates quantize differently)
    assert np.abs(ref - got).max() < 0.07


def test_superstem_rejects_bad_geometry():
    x = jnp.zeros((1, 60, 64, 3), jnp.uint8)
    with pytest.raises(ValueError):
        superstem(x, jnp.zeros((32, 28), jnp.bfloat16),
                  jnp.zeros((64, 289), jnp.bfloat16), interpret=True)
