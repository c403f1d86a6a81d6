"""Per-conv real-chip timing of the int8 engine's layers at 416.

For every ConvBnLeaky in the engine (PROFILE.md round-2 roofline was
bf16-only), measures the isolated int8 layer: conv(int8) + fused epilogue
+ requant — the unit the engine composes — vs the bf16 conv, plus an
im2col+int8-matmul alternative for the 3x3 convs (scripts/probe_int8_mxu.py
showed XLA's int8 MATMUL beats bf16 at K>=4608 even though its int8 CONV
does not).

All data device-generated (dev relay H2D ~7 MB/s, CLAUDE.md).

Usage:  python scripts/profile_int8_stages.py [bs]
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


# (name, spatial, cin, cout, ksize) for each engine conv at 416 input.
LAYERS = [
    ("s1 c0", 416, 3, 32, 3),
    ("s2 c0", 208, 32, 64, 3),
    ("s3 c0", 104, 64, 128, 3),
    ("s3 c1", 104, 128, 64, 1),
    ("s3 c2", 104, 64, 128, 3),
    ("s4 c0", 52, 128, 256, 3),
    ("s4 c1", 52, 256, 128, 1),
    ("s4 c2", 52, 128, 256, 3),
    ("s5 c0", 26, 256, 512, 3),
    ("s5 c1", 26, 512, 256, 1),
    ("s5 c2", 26, 256, 512, 3),
    ("s5 c3", 26, 512, 256, 1),
    ("s5 c4", 26, 256, 512, 3),
    ("s6 c0", 13, 512, 1024, 3),
    ("s6 c1", 13, 1024, 512, 1),
    ("s6 c2", 13, 512, 1024, 3),
    ("s6 c3", 13, 1024, 512, 1),
    ("s6 c4", 13, 512, 1024, 3),
    ("s7 c0", 13, 1024, 1024, 3),
    ("s7 c1", 13, 1024, 1024, 3),
    ("neck", 13, 3072, 1024, 3),
]


def int8_layer(x, wq, a, b, z):
    """conv(int8)->int32, fused affine+leaky epilogue, requant to int8 —
    the engine's per-layer unit (int8_engine.yolov2_int8_forward)."""
    dn = lax.conv_dimension_numbers(x.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x, wq, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = acc * a + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return jnp.clip(jnp.round(y * 0.25 + z), -128, 127).astype(jnp.int8)


def bf16_layer(x, wbf, a, b):
    dn = lax.conv_dimension_numbers(x.shape, wbf.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wbf, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    y = acc * a + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return y.astype(jnp.bfloat16)


def im2col_layer(x, wq_flat, a, b, z, ks):
    """3x3 conv as pad + patch-extract + ONE big-K int8 matmul."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        lax.slice(xp, (0, di, dj, 0), (n, di + h, dj + w, c))
        for di in range(ks) for dj in range(ks)
    ]
    patches = jnp.concatenate(taps, axis=-1).reshape(n * h * w, ks * ks * c)
    acc = lax.dot_general(
        patches, wq_flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32).reshape(n, h, w, -1)
    y = acc * a + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return jnp.clip(jnp.round(y * 0.25 + z), -128, 127).astype(jnp.int8)


def main():
    print(f"device: {jax.devices()[0]}  bs={BS}")
    keys = iter(jax.random.split(jax.random.key(0), 256))

    def mk_i8(shape):
        return jax.jit(
            lambda k: jax.random.randint(k, shape, -127, 128, jnp.int32)
            .astype(jnp.int8))(next(keys))

    print("| layer | GFLOP/img | int8 conv ms (TF/s) | bf16 ms (TF/s) | "
          "im2col-mm ms (TF/s) |")
    print("|---|---|---|---|---|")
    tot8 = totbf = totmm = 0.0
    for name, sp, cin, cout, ks in LAYERS:
        # Large-spatial layers at full batch OOM on f32 intermediates —
        # they are bandwidth-bound, so time a smaller batch and scale.
        bs_eff = 32 if sp >= 104 else BS
        scale = BS / bs_eff
        x8 = mk_i8((bs_eff, sp, sp, cin))
        wq = mk_i8((ks, ks, cin, cout))
        a = jnp.ones((cout,), jnp.float32) * 0.01
        b = jnp.zeros((cout,), jnp.float32)
        wbf = jax.jit(lambda k: jax.random.normal(
            k, (ks, ks, cin, cout), jnp.bfloat16))(next(keys))

        gflop = 2.0 * sp * sp * cin * cout * ks * ks / 1e9
        flops = gflop * 1e9 * bs_eff

        t8 = scale * bench(
            jax.jit(lambda x, w: int8_layer(x, w, a, b, 3.0)), x8, wq)
        tbf = scale * bench(
            jax.jit(lambda x, w: bf16_layer(x, w, a, b)), x8, wbf)
        row_mm = "-"
        tmm = None
        if ks == 3 and sp <= 52:
            wq_flat = wq.reshape(ks * ks * cin, cout)
            tmm = scale * bench(
                jax.jit(lambda x, w: im2col_layer(x, w, a, b, 3.0, ks)),
                x8, wq_flat,
            )
            row_mm = f"{tmm:.2f} ({flops * scale / (tmm * 1e-3) / 1e12:.0f})"
        tot8 += t8
        totbf += tbf
        totmm += tmm if tmm is not None else t8
        print(f"| {name} | {gflop:.2f} "
              f"| {t8:.2f} ({flops * scale / (t8 * 1e-3) / 1e12:.0f}) "
              f"| {tbf:.2f} ({flops * scale / (tbf * 1e-3) / 1e12:.0f}) "
              f"| {row_mm} |", flush=True)
    print(f"| total |  | {tot8:.1f} | {totbf:.1f} | {totmm:.1f} |")


if __name__ == "__main__":
    main()
