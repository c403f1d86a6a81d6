"""Per-stage backward attribution for the v2 training step (round 5).

Prefix-timing applied to the BACKWARD: for k = 1..7, jit
``grad(sum(truncate_after_stage_k(x)))`` and diff adjacent timings — each
diff is stage k's forward + backward (dgrad+wgrad+BN-bwd+leaky-bwd) cost.
The same truncation forward-only gives the per-stage forward cost, so the
bwd/fwd ratio per stage localizes the training MFU gap that
profile_train_step.py measured in aggregate.

Usage: python scripts/probe_backward_stages.py [bs] [size]
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

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 416


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
    from odc_tpu.models.layers import ConvBnLeaky, max_pool_2x2

    print(f"device: {jax.devices()[0]}  bs={BS}  size={SIZE}")

    class Trunc(nn.Module):
        upto: int  # number of stages to run

        @nn.compact
        def __call__(self, x, train=True):
            h = x
            for si, stage in enumerate(_STAGES[: self.upto]):
                if 1 <= si <= 5:
                    h = max_pool_2x2(h)
                for f, k in stage:
                    h = ConvBnLeaky(f, (k, k), dtype=jnp.bfloat16)(h, train)
            return h

    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, SIZE, SIZE, 3), jnp.bfloat16)
    )(jax.random.key(0))

    prev_f = prev_g = 0.0
    print("| stages | fwd ms | grad ms | Δfwd | Δ(fwd+bwd) | Δbwd/Δfwd |")
    print("|---|---|---|---|---|---|")
    for k in range(1, len(_STAGES) + 1):
        net = Trunc(upto=k)
        variables = jax.jit(net.init)(jax.random.key(1), x[:1])
        params, bstats = variables["params"], variables["batch_stats"]

        def head_sum(p, b, xx, net=net):
            y, _ = net.apply(
                {"params": p, "batch_stats": b}, xx, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y.astype(jnp.float32))

        f_fwd = jax.jit(
            lambda p, b, xx, net=net: net.apply(
                {"params": p, "batch_stats": b}, xx, train=False
            )
        )
        tf_ = bench(f_fwd, params, bstats, x)
        tg = bench(jax.jit(jax.grad(head_sum)), params, bstats, x)
        df, dg = tf_ - prev_f, tg - prev_g
        dbwd = dg - df
        ratio = dbwd / df if df > 0.05 else float("nan")
        print(
            f"| 1..{k} | {tf_:7.2f} | {tg:7.2f} | {df:6.2f} | {dg:6.2f} "
            f"| {ratio:5.2f} |",
            flush=True,
        )
        prev_f, prev_g = tf_, tg


if __name__ == "__main__":
    main()
