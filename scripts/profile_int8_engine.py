"""Prefix timing of the REAL int8 engine program (not isolated layers).

scripts/profile_int8_stages.py showed isolated early convs are dominated by
layout artifacts (an isolated s1 conv measures 30x the engine's real cost).
This script times jit(engine forward truncated after conv i) for increasing
i on the real chip; adjacent diffs give the true per-segment cost of the
compiled product path (modulo cross-boundary fusion at the cut).

Usage:  python scripts/profile_int8_engine.py [bs]
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


# Cut points: after each backbone conv 0..19, the concat (21), neck (22),
# and the full head (None).
CUTS = list(range(20)) + [21, 22, None]
NAMES = (
    [f"conv{i}" for i in range(20)] + ["concat", "neck", "head+reshape"]
)


def main():
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.int8_engine import calibrate, yolov2_int8_forward

    print(f"device: {jax.devices()[0]}  bs={BS}")
    model = YOLOv2()
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 416, 416, 3), jnp.uint8)
    )
    images = jax.jit(
        lambda k: jax.random.randint(k, (BS, 416, 416, 3), 0, 256, jnp.int32)
        .astype(jnp.uint8)
    )(jax.random.key(1))
    calib = jax.jit(
        lambda k: jax.random.randint(k, (8, 416, 416, 3), 0, 256, jnp.int32)
        .astype(jnp.uint8)
    )(jax.random.key(2))
    scales = calibrate(variables, calib)

    print("| cut | cum ms | seg ms |")
    print("|---|---|---|")
    prev = 0.0
    for cut, name in zip(CUTS, NAMES):
        f = jax.jit(functools.partial(
            yolov2_int8_forward, stop_after=cut))
        t = bench(f, variables, images, scales)
        print(f"| {name} | {t:.2f} | {t - prev:+.2f} |", flush=True)
        prev = t


if __name__ == "__main__":
    main()
