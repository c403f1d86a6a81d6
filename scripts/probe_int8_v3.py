"""Measure (don't extrapolate) int8 on YOLOv3's and YOLOv1's conv shapes
(round-4 verdict weak #3 / next #4).

PROFILE.md's "int8 is v2-only" conclusion was inferred from the large-K
threshold measured at the 13-grid (no gain at K=9 216 @13²) — but v3's
wide contractions live at DIFFERENT spatial regimes (K=4 608 @13², 2 304
@26², 1 152 @52²), and the threshold could plausibly be about total matmul
geometry, not K alone.  This script times, on the real chip:

1. isolated conv A/B (XLA bf16 vs XLA int8->int32) at every distinct v3
   3x3 shape, plus a synthetic 512->1024 @26² to separate the K effect
   from the spatial effect, plus YOLOv1's largest inception 3x3s;
2. a REAL subgraph A/B — the b5 block (stride-2 downsample + 4 residual
   bottlenecks) as one jitted program: all-bf16 vs int8 3x3s with the
   full dynamic-quant/requant chain (the honest cost a surgical engine
   would pay, including the quantize/dequantize traffic).

Usage:  python scripts/probe_int8_v3.py [bs]
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

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 256


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


def conv(x, w, out_t):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=out_t,
    )


def mk(key, shape, dtype):
    if dtype == jnp.int8:
        return jax.jit(
            lambda k: jax.random.randint(k, shape, -127, 128, jnp.int32)
            .astype(jnp.int8)
        )(key)
    return jax.jit(lambda k: jax.random.normal(k, shape, dtype))(key)


def isolated_convs():
    shapes = [
        # (label, spatial, cin, cout, bs_mult)
        ("v3 b5/p5/y32 3x3  512->1024 @13", 13, 512, 1024, 1),
        ("v3 b4/p4/y16 3x3  256-> 512 @26", 26, 256, 512, 1),
        ("v3 b3/p3/y8  3x3  128-> 256 @52", 52, 128, 256, 1),
        ("synthetic    3x3  512->1024 @26", 26, 512, 1024, 1),
        ("v1 5b incep  3x3  192-> 384 @7 ", 7, 192, 384, 1),
        ("v1 4e incep  3x3  160-> 320 @14", 14, 160, 320, 1),
    ]
    keys = iter(jax.random.split(jax.random.key(0), 64))
    print(f"\n== isolated conv A/B, bs={BS} ==")
    print("| shape | GFLOP | bf16 ms (TF/s) | int8 ms (TF/s) | int8/bf16 |")
    print("|---|---|---|---|---|")
    for label, s, cin, cout, mult in shapes:
        b = BS * mult
        xb = mk(next(keys), (b, s, s, cin), jnp.bfloat16)
        wb = mk(next(keys), (3, 3, cin, cout), jnp.bfloat16)
        x8 = mk(next(keys), (b, s, s, cin), jnp.int8)
        w8 = mk(next(keys), (3, 3, cin, cout), jnp.int8)
        gf = 2.0 * b * s * s * 9 * cin * cout / 1e9
        f_bf = jax.jit(lambda x, w: conv(x, w, jnp.float32))
        f_i8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
        t_bf = bench(f_bf, xb, wb)
        t_i8 = bench(f_i8, x8, w8)
        print(
            f"| {label} | {gf:.1f} | {t_bf:.2f} ({gf / t_bf:.0f}) "
            f"| {t_i8:.2f} ({gf / t_i8:.0f}) | {t_i8 / t_bf:.2f}x |",
            flush=True,
        )


def b5_subgraph():
    """The real b5 block (ds 512->1024/s2 @26->13 + 4 residuals) A/B."""
    from odc_tpu.ops.quantize import (
        quantize_dynamic, quantize_weights_per_channel,
    )

    keys = iter(jax.random.split(jax.random.key(1), 64))
    x = mk(next(keys), (BS, 26, 26, 512), jnp.bfloat16)
    w_ds = mk(next(keys), (3, 3, 512, 1024), jnp.bfloat16)
    w_r1 = [mk(next(keys), (1, 1, 1024, 512), jnp.bfloat16) for _ in range(4)]
    w_r3 = [mk(next(keys), (3, 3, 512, 1024), jnp.bfloat16) for _ in range(4)]

    def leaky(v):
        return jnp.where(v > 0, v, 0.1 * v)

    def conv_s2(xx, w, out_t):
        dn = lax.conv_dimension_numbers(
            xx.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(
            xx, w, (2, 2), "SAME", dimension_numbers=dn,
            preferred_element_type=out_t,
        )

    def bf16_block(xx):
        h = leaky(conv_s2(xx, w_ds, jnp.float32)).astype(jnp.bfloat16)
        for wr1, wr3 in zip(w_r1, w_r3):
            r = leaky(conv(h, wr1, jnp.float32)).astype(jnp.bfloat16)
            r = leaky(conv(r, wr3, jnp.float32)).astype(jnp.bfloat16)
            h = h + r
        return h

    def int8_block(xx):
        # 3x3s int8 (weights quantized in-graph, activations dynamic
        # per-tensor), 1x1s bf16 — the surgical pattern int8_neck uses.
        h = leaky(conv_s2(xx, w_ds, jnp.float32)).astype(jnp.bfloat16)
        for wr1, wr3 in zip(w_r1, w_r3):
            r = leaky(conv(h, wr1, jnp.float32))
            rq, sx = quantize_dynamic(r)
            wq, sw = quantize_weights_per_channel(wr3)
            acc = conv(rq, wq, jnp.int32)
            r = leaky(acc.astype(jnp.float32) * (sx * sw)).astype(
                jnp.bfloat16
            )
            h = h + r
        return h

    gf_bf = 2.0 * BS * (
        13 * 13 * 9 * 512 * 1024            # ds (at output res)
        + 4 * 13 * 13 * (1024 * 512 + 9 * 512 * 1024)
    ) / 1e9
    t_bf = bench(jax.jit(bf16_block), x)
    t_i8 = bench(jax.jit(int8_block), x)
    print(f"\n== b5 subgraph A/B, bs={BS} ({gf_bf:.0f} GFLOP) ==")
    print(f"bf16:          {t_bf:.2f} ms  ({gf_bf / t_bf:.0f} TF/s)")
    print(f"int8 3x3s:     {t_i8:.2f} ms  ({gf_bf / t_i8:.0f} TF/s)  "
          f"ratio {t_i8 / t_bf:.2f}x")


def main():
    print(f"device: {jax.devices()[0]}")
    isolated_convs()
    b5_subgraph()


if __name__ == "__main__":
    main()
