"""Real-chip multi-scale training throughput (VERDICT r2 weak#1 tail).

Measures the YOLOv2 train step at each multi-scale size (BASELINE config 4:
the reference repicks a random size per epoch, ``models/yolov2.py:1557-1571``)
plus the recompile cost paid at each size switch — the operational price of
the multi-scale policy on TPU (one XLA executable per size; the persistent
compilation cache amortizes repeats across runs).

Data stays device-resident (dev relay H2D is ~7 MB/s — CLAUDE.md).

Usage:  python scripts/profile_multiscale.py [bs] [sizes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZES = [int(s) for s in sys.argv[2:]] or [320, 352, 416, 480, 608]


def main():
    from odc_tpu.data.pipeline import Batch
    from odc_tpu.losses.yolo_loss import Lambdas
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.assign import assign
    from odc_tpu.train.trainer import TrainState, make_train_step

    print(f"device: {jax.devices()[0]}  bs={BS}  sizes={SIZES}")
    rng = np.random.default_rng(0)
    model = YOLOv2(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZES[0], SIZES[0], 3), jnp.uint8)
    )
    step = make_train_step(
        model, "v2", Lambdas(), model.anchors, momentum=0.9, weight_decay=5e-4
    )

    print("| size | compile s | steady ms/step | img/s |")
    print("|---|---|---|---|")
    for size in SIZES:
        h = w = size
        images = jax.device_put(
            rng.integers(0, 255, (BS, h, w, 3), dtype=np.uint8)
        )
        boxes = jax.device_put(
            np.tile(
                np.array(
                    [[0.1 * w, 0.1 * h, 0.5 * w, 0.6 * h],
                     [0.4 * w, 0.2 * h, 0.9 * w, 0.8 * h]], np.float32
                ),
                (BS, 1, 1),
            )
        )
        cls = jax.device_put(rng.integers(0, 20, (BS, 2)).astype(np.int32))
        valid = jax.device_put(np.ones((BS, 2), bool))
        tgt = jax.jit(
            lambda b, c, v: assign(b, c, v, (h, w), mode="v2")
        )(boxes, cls, valid)
        batch = Batch(
            image=images, cell=tgt.cell, sig_txty=tgt.sig_txty,
            twth=tgt.twth, box=boxes, cls=cls, valid=valid,
            img_id=jax.device_put(np.arange(BS, dtype=np.int32)),
        )

        def sync(x):
            # block_until_ready can return early through the dev relay
            # (CLAUDE.md) — force a real sync with a tiny D2H fetch.
            np.asarray(jnp.ravel(x)[:1])

        # Fresh param copies per size: the step donates its input state and
        # ``variables`` is shared across sizes.
        state = TrainState.create(jax.tree.map(jnp.copy, variables))
        t0 = time.perf_counter()
        state, m = step(state, batch, jnp.float32(1e-3), jax.random.key(0))
        sync(m["loss"])
        compile_s = time.perf_counter() - t0

        for i in range(2):
            state, m = step(state, batch, jnp.float32(1e-3), jax.random.key(i))
        sync(m["loss"])
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            state, m = step(state, batch, jnp.float32(1e-3), jax.random.key(i))
        sync(m["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(
            f"| {size} | {compile_s:.1f} | {ms:.1f} | {BS / ms * 1e3:.0f} |"
        )


if __name__ == "__main__":
    main()
