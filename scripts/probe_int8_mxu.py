"""Real-chip probe: can a Pallas int8 matmul reach the 394 TF/s MXU path
at the mid-K shapes XLA refuses?

PROFILE.md ("What was tried" #3): XLA lowers int8 convs onto the fast MXU
path only at very large contraction K (the 3072->1024 neck, K=27 648,
wins 1.78x); the 13-grid convs (K=4 608..9 216) show NO int8 gain in any
XLA formulation.  If a hand-written Pallas int8 matmul does engage the
int8 MXU at those K, every stage-5..7 conv can run as im2col + Pallas
matmul and the engine gains ~50 ms/batch at bs=1024.

Shapes probed = the im2col matmuls of the large engine convs at 416:

  stage6/7 3x3 1024->1024 @13 grid:  M=B*169, K=9216, N=1024
  stage6   3x3  512->1024 @13 grid:  M=B*169, K=4608, N=1024
  stage6   1x1 1024-> 512 @13 grid:  M=B*169, K=1024, N=512
  stage5   3x3  256-> 512 @26 grid:  M=B*676, K=2304, N=512

Usage:  python scripts/probe_int8_mxu.py [M]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=acc_ref.dtype
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def pallas_matmul(a, b, bm=512, bk=1536, bn=512, out_dtype=None):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    bm, bk, bn = min(bm, m), min(bk, k), min(bn, n)
    assert m % bm == 0 and k % bk == 0 and n % bn == 0, (m, k, n, bm, bk, bn)
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    out_dtype = out_dtype or acc_dtype
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(_mm_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)


def main():
    m_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 21632  # 128*169
    print(f"device: {jax.devices()[0]}")

    shapes = [
        ("13grid 3x3 1024->1024", m_arg, 9216, 1024),
        ("13grid 3x3  512->1024", m_arg, 4608, 1024),
        ("13grid 1x1 1024-> 512", m_arg, 1024, 512),
        ("26grid 3x3  256-> 512", m_arg * 4, 2304, 512),
    ]

    # All data generated ON DEVICE: the dev relay's H2D is ~7 MB/s
    # (CLAUDE.md) — a device_put of a 400 MB operand takes a minute.
    def mk(key, shape, dtype):
        if dtype == jnp.int8:
            return jax.jit(
                lambda k: jax.random.randint(k, shape, -127, 128, jnp.int32)
                .astype(jnp.int8), )(key)
        return jax.jit(
            lambda k: jax.random.normal(k, shape, dtype))(key)

    print("| shape | M,K,N | XLA bf16 ms (TF/s) | XLA int8 ms | "
          "pallas int8 ms (TF/s) | max|err| |")
    print("|---|---|---|---|---|---|")
    keys = iter(jax.random.split(jax.random.key(0), 64))
    for name, m, k, n in shapes:
        # round M to tile multiple
        m = (m // 512) * 512
        a8 = mk(next(keys), (m, k), jnp.int8)
        b8 = mk(next(keys), (k, n), jnp.int8)
        abf = mk(next(keys), (m, k), jnp.bfloat16)
        bbf = mk(next(keys), (k, n), jnp.bfloat16)

        flops = 2.0 * m * k * n

        f_bf = jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32))
        t_bf = bench(f_bf, abf, bbf)

        f_x8 = jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        t_x8 = bench(f_x8, a8, b8)

        f_p8 = jax.jit(lambda x, y: pallas_matmul(x, y))
        try:
            t_p8 = bench(f_p8, a8, b8)
            # correctness vs XLA int32 reference on a slice
            ref = np.asarray(f_x8(a8[:512], b8))
            got = np.asarray(f_p8(a8[:512], b8))
            err = np.abs(ref.astype(np.int64) - got.astype(np.int64)).max()
            p8 = f"{t_p8:.2f} ({flops / (t_p8 * 1e-3) / 1e12:.0f})"
        except Exception as e:  # noqa: BLE001 - probe reports, not dies
            p8, err = f"FAIL {type(e).__name__}: {str(e)[:120]}", "-"
        print(f"| {name} | {m},{k},{n} "
              f"| {t_bf:.2f} ({flops / (t_bf * 1e-3) / 1e12:.0f}) "
              f"| {t_x8:.2f} | {p8} | {err} |", flush=True)


if __name__ == "__main__":
    main()
