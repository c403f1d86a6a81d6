"""Prefix timing of the REAL YOLOv3 program (round-4 verdict weak #2).

Same methodology as scripts/profile_int8_engine.py: isolated-layer timing
lies for early layers, so we time ``jit(forward truncated at probe P)`` for
each probe on the real chip; adjacent diffs give the true per-segment cost
of the compiled product path (modulo cross-boundary fusion at the cut).
Each segment also gets an analytic FLOP count -> per-segment TF/s and MFU
against the v5e's 197 TF/s bf16 peak, so the output says WHERE the ~67%
aggregate MFU is lost.

Usage:  python scripts/profile_yolov3.py [bs] [size]
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

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
PEAK_TFS = 197.0  # v5e bf16


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


def conv_flops(hw, k, cin, cout):
    return 2.0 * hw * hw * k * k * cin * cout


def segment_flops(size):
    """Analytic per-probe-segment GFLOP/img for YOLOv3 at `size`."""
    s = size

    def res_block(hw, c):  # 1x1 c->c/2 + 3x3 c/2->c
        return conv_flops(hw, 1, c, c // 2) + conv_flops(hw, 3, c // 2, c)

    def five(hw, cin, f):  # 1x1 cin->f, (3x3 f->2f, 1x1 2f->f) x2
        return (
            conv_flops(hw, 1, cin, f)
            + 2 * (conv_flops(hw, 3, f, 2 * f) + conv_flops(hw, 1, 2 * f, f))
        )

    def head(hw, f):  # 3x3 f->2f + 1x1 2f->75
        return conv_flops(hw, 3, f, 2 * f) + conv_flops(hw, 1, 2 * f, 75)

    def merge_stage(hw, c_lat, f):
        """t reduce (1x1 2f->f at hw/2) + fused lateral merge (zr at hw/2,
        zc over the c_lat-ch backbone tap at hw) + the remaining four
        five-conv layers at hw (models/yolov3.py::_LateralMerge)."""
        return (
            conv_flops(hw // 2, 1, 2 * f, f)       # t reduce
            + conv_flops(hw // 2, 1, f, f)         # zr (coarse)
            + conv_flops(hw, 1, c_lat, f)          # zc (fine)
            + 2 * (conv_flops(hw, 3, f, 2 * f) + conv_flops(hw, 1, 2 * f, f))
        )

    segs = {
        "stem": conv_flops(s, 3, 3, 32),
        "b1": conv_flops(s // 2, 3, 32, 64) + 1 * res_block(s // 2, 64),
        "b2": conv_flops(s // 4, 3, 64, 128) + 2 * res_block(s // 4, 128),
        "b3": conv_flops(s // 8, 3, 128, 256) + 8 * res_block(s // 8, 256),
        "b4": conv_flops(s // 16, 3, 256, 512) + 8 * res_block(s // 16, 512),
        "b5": conv_flops(s // 32, 3, 512, 1024) + 4 * res_block(s // 32, 1024),
        "p5": five(s // 32, 1024, 512),
        "y32": head(s // 32, 512),
        "p4": merge_stage(s // 16, 512, 256),
        "y16": head(s // 16, 256),
        "p3": merge_stage(s // 8, 256, 128),
        "y8(full)": head(s // 8, 128),
    }
    return {k: v / 1e9 for k, v in segs.items()}


PROBES = [
    ("stem", "stem"), ("b1", "b1"), ("b2", "b2"), ("b3", "b3"),
    ("b4", "b4"), ("b5", "b5"), ("p5", "p5"), ("y32", "y32"),
    ("p4", "p4"), ("y16", "y16"), ("p3", "p3"), ("y8(full)", None),
]


def main():
    from odc_tpu.models import YOLOv3
    from odc_tpu.ops.detect import make_infer_fn

    print(f"device: {jax.devices()[0]}  bs={BS}  size={SIZE}")
    model = YOLOv3(dtype=jnp.bfloat16, image_size=(SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8)
    )
    images = jax.jit(
        lambda k: jax.random.randint(k, (BS, SIZE, SIZE, 3), 0, 256, jnp.int32)
        .astype(jnp.uint8)
    )(jax.random.key(1))

    flops = segment_flops(SIZE)
    total_gf = sum(flops.values())
    print(f"analytic total: {total_gf:.1f} GFLOP/img")
    print("| probe | cum ms | seg ms | GFLOP/img | TF/s | MFU |")
    print("|---|---|---|---|---|---|")
    prev = 0.0
    for name, cut in PROBES:
        # Return a 1-element slice behind an optimization_barrier: the
        # barrier forces the full truncated output to be computed (no DCE
        # narrowing of the last conv), while the tiny returned buffer keeps
        # the async dispatch queue from holding N multi-GB outputs in
        # flight (bf16 stem output at bs=256 is 2.8 GB -> OOM otherwise).
        def f_(v, x, cut=cut):
            out = model.apply(v, x, train=False, stop_after=cut)
            out = jax.tree.map(jax.lax.optimization_barrier, out)
            return jax.tree.map(lambda t: t.ravel()[:1], out)

        f = jax.jit(f_)
        t = bench(f, variables, images)
        seg = t - prev
        gf = flops[name]
        tfs = gf * BS / max(seg, 1e-9)  # GFLOP*B / ms == TF/s
        print(
            f"| {name} | {t:.2f} | {seg:+.2f} | {gf:.2f} | {tfs:.0f} "
            f"| {tfs / PEAK_TFS:.0%} |",
            flush=True,
        )
        prev = t

    # e2e tail: decode_v3 over all boxes + NMS.
    infer = jax.jit(
        make_infer_fn(model, conf_thre=0.9, iou_thre=0.5, max_keep=64)
    )
    t = bench(infer, variables, images)
    print(f"| +decode+NMS | {t:.2f} | {t - prev:+.2f} | — | — | — |")
    print(
        f"e2e: {t:.2f} ms -> {BS / t * 1e3:.0f} img/s; "
        f"aggregate {total_gf * BS / t:.0f} TF/s = "
        f"{total_gf * BS / t / PEAK_TFS:.0%} MFU"
    )


if __name__ == "__main__":
    main()
