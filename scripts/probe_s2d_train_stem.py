"""Measure an s2d-lifted TRAINING stem (round 5, verdict weak #4).

The early-stage training backward is lane-starved: conv0/conv1 feature
maps (C=32/64, bf16 NHWC) pad the 128-lane memory path 4x/2x, and pool1's
select-and-scatter backward alone costs ~12 ms at bs=64
(probe_pool_variants.py).  The int8 engine's s2d stem already fixes the
same problem for inference (int8_engine.py `_s2d_stem_kernel`): conv+pool
lifted into ONE 4x4/stride-2 conv emitting all four pool phases as
channels (full lanes, quarter rows), followed by a channelwise phase-max.

For training the lift must keep BN batch semantics: conv -> BN -> leaky ->
pool becomes  lifted-conv -> BN over PHASE GROUPS (stats reduced over
N,H,W,phase; the same [cout] params/stats) -> leaky -> phase-max.  Every
step is an algebraic rewrite of the same math — same param tree, gradients
flow to the original 3x3 kernel through the (tiny) lift scatter.

Variants timed as grad(sum(net(x))) wrt params at bs=64/416 through
stages 1-3 (so downstream consumers of the stem's layout are included):

  base   shipped: conv+BN+leaky, pool between stages (reduce_window)
  s2d1   stage 1 lifted (conv0+pool1), stages 2-3 as shipped
  s2d2   stages 1 and 2 lifted

Also asserts fwd + param-grad equivalence of the lifts vs base in f32.

Usage: python scripts/probe_s2d_train_stem.py
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
from jax import lax

BS = 64
SIZE = 416


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


def lift_kernel(k):
    """[3,3,cin,cout] -> [4,4,cin,4*cout]: phase p=(pi,pj) output channels
    p*cout:(p+1)*cout reproduce the 3x3 SAME conv at (2i+pi, 2j+pj)
    (int8_engine._s2d_stem_kernel, re-derived differentiably)."""
    cin, cout = k.shape[2], k.shape[3]
    w = jnp.zeros((4, 4, cin, 4 * cout), k.dtype)
    for pi in (0, 1):
        for pj in (0, 1):
            p = pi * 2 + pj
            w = w.at[pi : pi + 3, pj : pj + 3, :,
                     p * cout : (p + 1) * cout].set(k)
    return w


def conv(x, k, dtype, strides=(1, 1), padding="SAME"):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), strides, padding,
        dimension_numbers=dn,
    )


def bn_leaky(y, scale, bias, groups=1):
    """Torch-style training BN + leaky(0.1); with groups=g, stats reduce
    over (N,H,W,phase) for channel layout [..., g*cout] (phase-major)."""
    cout = y.shape[-1] // groups
    yf = y.astype(jnp.float32)
    if groups == 1:
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
    else:
        yr = yf.reshape(*yf.shape[:-1], groups, cout)
        mean = jnp.mean(yr, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(yr - mean), axis=(0, 1, 2, 3))
        mean, var = jnp.tile(mean, groups), jnp.tile(var, groups)
    out = (yf - mean) * lax.rsqrt(var + 1e-5)
    out = out * jnp.tile(scale, groups if groups > 1 else 1) + jnp.tile(
        bias, groups if groups > 1 else 1
    )
    return jnp.where(out > 0, out, 0.1 * out)


def phase_max(y):
    b, h, w, c4 = y.shape
    return y.reshape(b, h, w, 4, c4 // 4).max(axis=3)


def pool(x):
    import flax.linen as nn

    return nn.max_pool(x, (2, 2), (2, 2))


STAGE3 = ((128, 3), (64, 1), (128, 3))


def make_params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 16)
    p = {}
    shapes = [("c0", (3, 3, 3, 32)), ("c1", (3, 3, 32, 64))]
    for i, (f, k) in enumerate(STAGE3):
        cin = 64 if i == 0 else STAGE3[i - 1][0]
        shapes.append((f"s3_{i}", (k, k, cin, f)))
    for i, (name, s) in enumerate(shapes):
        p[name + "_k"] = (
            jax.random.normal(ks[i], s, dtype) * (2.0 / np.prod(s[:3])) ** 0.5
        )
        p[name + "_scale"] = jnp.ones((s[-1],), jnp.float32)
        p[name + "_bias"] = jnp.zeros((s[-1],), jnp.float32)
    return p


def net(p, x, variant, dtype):
    # stage 1 (+pool1)
    if variant in ("s2d1", "s2d2"):
        h = conv(x, lift_kernel(p["c0_k"]), dtype, (2, 2),
                 [(1, 1), (1, 1)])
        h = phase_max(
            bn_leaky(h, p["c0_scale"], p["c0_bias"], groups=4)
        ).astype(dtype)
    else:
        h = conv(x, p["c0_k"], dtype)
        h = pool(bn_leaky(h, p["c0_scale"], p["c0_bias"]).astype(dtype))
    # stage 2 (+pool2)
    if variant == "s2d2":
        h = conv(h, lift_kernel(p["c1_k"]), dtype, (2, 2),
                 [(1, 1), (1, 1)])
        h = phase_max(
            bn_leaky(h, p["c1_scale"], p["c1_bias"], groups=4)
        ).astype(dtype)
    else:
        h = conv(h, p["c1_k"], dtype)
        h = pool(bn_leaky(h, p["c1_scale"], p["c1_bias"]).astype(dtype))
    # stage 3 (shipped form) so the stem's output layout feeds real work
    for i, (f, k) in enumerate(STAGE3):
        h = conv(h, p[f"s3_{i}_k"], dtype)
        h = bn_leaky(h, p[f"s3_{i}_scale"], p[f"s3_{i}_bias"]).astype(dtype)
    return h


def main():
    print(f"device: {jax.devices()[0]}  bs={BS}  size={SIZE}")
    key = jax.random.key(0)
    p32 = make_params(key)

    # --- equivalence in true f32 (precision='float32': TPU convs otherwise
    # run bf16-decomposed, polluting an exactness check) ---
    with jax.default_matmul_precision("float32"):
        xs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3),
                               jnp.float32)
        base = jax.jit(lambda p, x: net(p, x, "base", jnp.float32))(p32, xs)
        for v in ("s2d1", "s2d2"):
            out = jax.jit(
                lambda p, x, v=v: net(p, x, v, jnp.float32)
            )(p32, xs)
            err = float(jnp.max(jnp.abs(out - base)))
            print(f"  fwd  {v} vs base: max|Δ| = {err:.2e}")
            assert err < 1e-5, v
        gb = jax.jit(jax.grad(lambda p, x: jnp.sum(
            net(p, x, "base", jnp.float32))))(p32, xs)
        for v in ("s2d1", "s2d2"):
            gv = jax.jit(jax.grad(lambda p, x, v=v: jnp.sum(
                net(p, x, v, jnp.float32))))(p32, xs)
            errs = jax.tree.map(
                lambda a, b: float(
                    jnp.max(jnp.abs(a - b))
                    / (float(jnp.max(jnp.abs(a))) + 1e-6)
                ),
                gb, gv,
            )
            worst = max(errs.values())
            print(f"  grad {v} vs base: max rel Δ = {worst:.2e}")
            assert worst < 1e-4, (v, errs)

    # --- timing in bf16 at bs=64/416 ---
    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, SIZE, SIZE, 3), jnp.bfloat16)
    )(jax.random.key(2))
    for v in ("base", "s2d1", "s2d2"):
        def loss(p, xx, v=v):
            return jnp.sum(net(p, xx, v, jnp.bfloat16).astype(jnp.float32))

        tf_ = bench(jax.jit(loss), p32, x)
        tg = bench(jax.jit(jax.grad(loss)), p32, x)
        print(f"  {v:5s} fwd(sum) {tf_:7.2f} ms   grad {tg:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
