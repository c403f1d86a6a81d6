"""E2E engine timing vs the bf16_front split point (real chip).

PROFILE.md round 4: XLA's int8 conv path is ~3x slower than bf16 at tiny
channel widths (conv0: 9.8 vs 3.6 ms at bs=256) — the engine's front
should stay bf16 until channels reach MXU-friendly sizes.  This probes
where the crossover sits.

Usage:  python scripts/probe_bf16_front.py [bs] [fronts...]
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
FRONTS = [int(x) for x in sys.argv[2:]] or [0, 1, 2, 3, 5, 8]


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

    print("| variant | ms/batch | img/s |")
    print("|---|---|---|")
    for front in FRONTS:
        f = jax.jit(functools.partial(
            yolov2_int8_forward, bf16_front=front))
        t = bench(f, variables, images, scales)
        print(f"| bf16_front={front} | {t:.2f} | {BS / t * 1e3:.0f} |",
              flush=True)
    f = jax.jit(functools.partial(yolov2_int8_forward, stem="s2d"))
    t = bench(f, variables, images, scales)
    print(f"| stem=s2d | {t:.2f} | {BS / t * 1e3:.0f} |", flush=True)


if __name__ == "__main__":
    main()
