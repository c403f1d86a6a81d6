"""Micro-ablate the stage-2/3 backward anomaly (round 5, verdict weak #4).

probe_backward_stages.py localized ~43 ms of the 68 ms v2 backward
(bs=64/416) to Darknet-19 stages 2-3 — shapes where the conv FLOPs are
trivial (~1 ms at the late-stage rate).  Each variant below is a complete
``grad(sum(block(x)), wrt=(params, x))`` program on the real chip (grad wrt
x included so every variant pays the full cotangent chain, as it does
inside the real net):

  full       pool -> conv -> BN(f32, torch semantics) -> leaky   (shipped)
  no_pool    conv -> BN -> leaky on the pre-pooled input
  no_bn      pool -> conv -> leaky
  bn_bf16    pool -> conv -> BN normalizing in bf16 (stats still f32)
  conv_only  pool -> conv

Diffs attribute the block's backward to pool-bwd / BN-f32-bwd / wgrad.

Usage: python scripts/probe_stage2_ablation.py [stage]  (2 or 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BS = 64


def sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import flax.linen as nn

    from odc_tpu.models.backbones.darknet19 import _STAGES
    from odc_tpu.models.layers import max_pool_2x2

    # stage-2 input: [B, 416, 416, 32]; stage-3 input: [B, 208, 208, 64]
    in_hw = 416 if STAGE == 2 else 208
    in_ch = 32 if STAGE == 2 else 64
    convs = _STAGES[STAGE - 1]
    print(f"device: {jax.devices()[0]}  stage={STAGE} "
          f"input=[{BS},{in_hw},{in_hw},{in_ch}] convs={convs}")

    class BnBf16(nn.Module):
        """BN whose normalize runs in bf16 (batch stats still f32)."""

        @nn.compact
        def __call__(self, x):
            feat = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (feat,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (feat,),
                              jnp.float32)
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
                var + 1e-5
            ).astype(x.dtype)
            return y * scale.astype(x.dtype) + bias.astype(x.dtype)

    from odc_tpu.models.layers import TorchBatchNorm

    class V(nn.Module):
        variant: str

        @nn.compact
        def __call__(self, x):
            h = x
            if self.variant != "no_pool":
                h = max_pool_2x2(h)
            for f, k in convs:
                h = nn.Conv(f, (k, k), padding="SAME", dtype=jnp.bfloat16,
                            param_dtype=jnp.float32)(h)
                if self.variant in ("full", "no_pool"):
                    h = TorchBatchNorm(use_running_average=False)(h)
                    h = nn.leaky_relu(h, 0.1).astype(jnp.bfloat16)
                elif self.variant == "bn_bf16":
                    h = BnBf16()(h)
                    h = nn.leaky_relu(h, 0.1).astype(jnp.bfloat16)
                elif self.variant == "no_bn":
                    h = nn.leaky_relu(h, 0.1).astype(jnp.bfloat16)
                # conv_only: nothing
            return h

    for variant in ("full", "no_pool", "no_bn", "bn_bf16", "conv_only"):
        shape = (
            (BS, in_hw // 2, in_hw // 2, in_ch)
            if variant == "no_pool"
            else (BS, in_hw, in_hw, in_ch)
        )
        x = jax.jit(
            lambda k, s=shape: jax.random.normal(k, s, jnp.bfloat16)
        )(jax.random.key(0))
        net = V(variant=variant)
        variables = jax.jit(net.init)(jax.random.key(1), x[:1])
        params = variables["params"]

        def fwd_sum(p, xx, net=net):
            out = net.apply({"params": p}, xx, mutable=["batch_stats"])
            y = out[0] if isinstance(out, tuple) else out
            return jnp.sum(y.astype(jnp.float32))

        tf_ = bench(jax.jit(fwd_sum), params, x)
        tg = bench(jax.jit(jax.grad(fwd_sum, argnums=(0, 1))), params, x)
        print(f"  {variant:10s} fwd {tf_:7.2f} ms   grad {tg:7.2f} ms   "
              f"bwd-only {tg - tf_:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
