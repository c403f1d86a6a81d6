"""Isolated 2x2/2 max-pool fwd+bwd timings (round 5, verdict weak #4).

probe_stage2_ablation.py attributed ~12 ms of stage-2's 19 ms backward to
the pool's select-and-scatter.  This times the pool op ALONE (grad wrt x,
scalar-sum head) at each Darknet-19 pool shape for four formulations:

  rw       nn.max_pool (lax.reduce_window) — shipped; bwd = select-and-scatter
  reshape  [N,H/2,2,W/2,2,C] max over (2,4)
  slices   max of the four strided slices x[:, i::2, j::2]; bwd = four
           interior-pads (no scatter)
  avg      2x2 avg pool — the bandwidth-floor reference (bwd = broadcast)

Tie semantics: rw routes the cotangent to the first max (== torch
MaxPool2d); reshape/slices split ties across jnp.maximum branches — only
matters on exact bf16 ties.

Usage: python scripts/probe_pool_variants.py
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

BS = 64
SHAPES = [  # input of each Darknet-19 pool at 416
    (416, 32),
    (208, 64),
    (104, 128),
    (52, 256),
    (26, 512),
]


def sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])


def bench(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def pool_rw(x):
    import flax.linen as nn

    return nn.max_pool(x, (2, 2), (2, 2))


def pool_reshape(x):
    n, h, w, c = x.shape
    return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def pool_slices(x):
    return jnp.maximum(
        jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
        jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]),
    )


def pool_avg(x):
    import flax.linen as nn

    return nn.avg_pool(x, (2, 2), (2, 2))


def main():
    print(f"device: {jax.devices()[0]}  bs={BS}")
    variants = [("rw", pool_rw), ("reshape", pool_reshape),
                ("slices", pool_slices), ("avg", pool_avg)]
    print("| shape | GB (r+w) | " +
          " | ".join(f"{n} fwd/grad ms" for n, _ in variants) + " |")
    for hw, c in SHAPES:
        x = jax.jit(
            lambda k, s=(BS, hw, hw, c): jax.random.normal(k, s, jnp.bfloat16)
        )(jax.random.key(0))
        gb = (BS * hw * hw * c * 2) * 1.25 / 1e9  # in + out/4 bytes
        row = [f"| {hw}²x{c} | {gb:.2f} "]
        for name, fn in variants:
            g = jax.jit(jax.grad(lambda xx, fn=fn: jnp.sum(
                fn(xx).astype(jnp.float32))))
            f = jax.jit(fn)
            tf_ = bench(f, x)
            tg = bench(g, x)
            row.append(f"| {tf_:.2f}/{tg:.2f} ")
        print("".join(row) + "|", flush=True)


if __name__ == "__main__":
    main()
