"""Attribute the v2 training backward gap (round-5, verdict weak #4).

profile_train_step.py showed backward-only time runs at ~55 TF/s vs the
forward's 86 TF/s (bs=64/416).  Two suspects measured here, each as a
complete jitted grad program on the real chip:

  pool=rw       shipped `nn.max_pool` (lax.reduce_window); its backward is
                a select-and-scatter, a historically slow TPU lowering.
  pool=reshape  [N,H,W,C] -> [N,H/2,2,W/2,2,C] max over (2,4): identical
                forward on even extents, backward is broadcast-compare-
                select (no scatter).

Also times grad of a single ConvBnLeaky tower (no pools at all) at each
stage's shape to separate "conv backward is just slower" from "pools".

Usage: python scripts/probe_pool_backward.py [bs] [size]
"""

from __future__ import annotations

import functools
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
PEAK_TFS = 197.0


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


def pool_reshape(x):
    n, h, w, c = x.shape
    return jnp.max(
        x[:, : h // 2 * 2, : w // 2 * 2].reshape(n, h // 2, 2, w // 2, 2, c),
        axis=(2, 4),
    )


def main():
    import flax.linen as nn

    from odc_tpu.models.backbones.darknet19 import _STAGES
    from odc_tpu.models.layers import ConvBnLeaky, max_pool_2x2

    print(f"device: {jax.devices()[0]}  bs={BS}  size={SIZE}")

    class Net(nn.Module):
        pool: str = "rw"

        @nn.compact
        def __call__(self, x, train=True):
            h = x
            for si, stage in enumerate(_STAGES):
                if 1 <= si <= 5:
                    h = max_pool_2x2(h) if self.pool == "rw" else pool_reshape(h)
                for f, k in stage:
                    h = ConvBnLeaky(f, (k, k), dtype=jnp.bfloat16)(h, train)
            return h

    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, SIZE, SIZE, 3), jnp.bfloat16)
    )(jax.random.key(0))

    for pool in ("rw", "reshape"):
        net = Net(pool=pool)
        variables = jax.jit(net.init)(jax.random.key(1), x[:1])
        params, bstats = variables["params"], variables["batch_stats"]

        def head_sum(p, b, xx):
            y, _ = net.apply(
                {"params": p, "batch_stats": b}, xx, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y.astype(jnp.float32))

        f_fwd = jax.jit(functools.partial(net.apply, train=False))
        # inference variant without batch_stats mutation for fwd timing
        f_fwd = jax.jit(
            lambda p, b, xx: net.apply(
                {"params": p, "batch_stats": b}, xx, train=False
            )
        )
        tf_ = bench(f_fwd, params, bstats, x)
        f_g = jax.jit(jax.grad(head_sum))
        tg = bench(f_g, params, bstats, x)
        print(
            f"pool={pool:8s} fwd {tf_:7.2f} ms   grad {tg:7.2f} ms   "
            f"bwd-only {tg - tf_:7.2f} ms"
        )


if __name__ == "__main__":
    main()
