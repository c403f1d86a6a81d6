"""Decompose the YOLOv2 training step's ~44% MFU (round-4 verdict weak #4).

A backward pass has no prefix-timing handle (XLA schedules fwd/bwd as one
program), so the decomposition is by PROGRAM ABLATION — each variant is a
complete jitted program on the real chip, and adjacent diffs attribute the
step's time:

  fwd        inference forward (the 85-87% MFU reference point)
  fwd_bn     training forward (batch-stats mode) + loss, no gradients
  grad_head  value_and_grad of sum(head): pure conv fwd+bwd, no loss graph
  grad_loss  value_and_grad of the real loss (adds assigned-loss backward)
  step       the shipped train_step (adds torch-SGD update + donation)

FLOP model: backward(conv) = dgrad + wgrad = 2x forward FLOPs, so
grad_head's analytic total is 3x the forward's 29.2 GFLOP/img; MFU columns
use that.

Usage:  python scripts/profile_train_step.py [bs] [size]
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
FWD_GF = 29.2 * (SIZE * SIZE) / (416 * 416)  # PROFILE.md v2-416 forward


def sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])


def bench(fn, *args, iters=20, warmup=3, fresh=None):
    for _ in range(warmup):
        out = fn(*(fresh() if fresh else args))
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*(fresh() if fresh else args))
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from odc_tpu.config import TrainConfig
    from odc_tpu.losses.yolo_loss import Lambdas, yolo_loss
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.assign import assign
    from odc_tpu.train.trainer import TrainState, make_train_step

    print(f"device: {jax.devices()[0]}  bs={BS}  size={SIZE}")
    model = YOLOv2(dtype=jnp.bfloat16, image_size=(SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8)
    )
    state = TrainState.create(variables)
    lambdas = Lambdas(5.0, 5.0, 1.0, 0.5, 1.0)

    key = jax.random.key(1)
    images = jax.jit(
        lambda k: jax.random.randint(k, (BS, SIZE, SIZE, 3), 0, 256,
                                     jnp.int32).astype(jnp.uint8)
    )(key)
    # Synthetic targets: 4 boxes/img, on-device assignment (as the real
    # pipeline would have done on host; cost not counted in any variant).
    box = jax.jit(
        lambda k: jnp.concatenate([
            jax.random.uniform(k, (BS, 4, 2), jnp.float32, 10., 100.),
            jax.random.uniform(k, (BS, 4, 2), jnp.float32, 120., 300.),
        ], -1)
    )(key)
    cls = jnp.zeros((BS, 4), jnp.int32)
    valid = jnp.ones((BS, 4), bool)
    targets = jax.jit(
        functools.partial(assign, image_hw=(SIZE, SIZE), mode="v2")
    )(box, cls, valid)

    rows = []

    def add(name, t, gf):
        rows.append((name, t, gf))
        print(f"  {name}: {t:.2f} ms", flush=True)

    # 1) inference forward (reference point)
    f_fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t = bench(f_fwd, variables, images)
    add("fwd (inference)", t, FWD_GF)

    # 2) training forward + loss, no grad
    def fwd_loss(params, bstats, x, tg):
        y, mut = model.apply(
            {"params": params, "batch_stats": bstats}, x, train=True,
            mutable=["batch_stats"],
        )
        det = model.decode(y, (SIZE, SIZE))
        total, _ = yolo_loss(det, tg, lambdas, mode="v2",
                             anchors=model.anchors)
        return total, mut

    f_fl = jax.jit(fwd_loss)
    t = bench(f_fl, state.params, state.batch_stats, images, targets)
    add("fwd(train)+loss", t, FWD_GF)

    # 3) grad of sum(head): conv fwd+bwd only
    def head_sum(params, bstats, x):
        y, _ = model.apply(
            {"params": params, "batch_stats": bstats}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(y.astype(jnp.float32))

    f_gh = jax.jit(jax.grad(head_sum))
    t = bench(f_gh, state.params, state.batch_stats, images)
    add("grad(sum(head))", t, 3 * FWD_GF)

    # 4) grad of the real loss
    def loss_only(params, bstats, x, tg):
        total, _ = fwd_loss(params, bstats, x, tg)
        return total

    f_gl = jax.jit(jax.grad(loss_only))
    t = bench(f_gl, state.params, state.batch_stats, images, targets)
    add("grad(loss)", t, 3 * FWD_GF)

    # 5) the shipped step (donation: rebuild state each call)
    cfg = TrainConfig(learning_rate_list=[1e-3], num_epoch_list=[1],
                      batch_size=BS, max_boxes=4, multiscale_sizes=())
    step = make_train_step(
        model, "v2", lambdas, anchors=model.anchors,
        momentum=cfg.momentum, weight_decay=cfg.weight_decay,
    )

    from odc_tpu.data.pipeline import Batch

    batch = Batch(
        image=images, cell=targets.cell, sig_txty=targets.sig_txty,
        twth=targets.twth, box=box, cls=cls, valid=valid,
        img_id=jnp.arange(BS, dtype=jnp.int32),
    )

    # The step donates its input state, so thread the returned state
    # through the loop (rebuilding from `variables` would reuse donated
    # buffers and poison them on call 2).
    st = TrainState.create(jax.tree.map(jnp.copy, variables))
    key2 = jax.random.key(2)
    for _ in range(3):
        st, m = step(st, batch, 1e-3, key2)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(10):
        st, m = step(st, batch, 1e-3, key2)
    sync(m)
    t = (time.perf_counter() - t0) / 10 * 1e3
    add("train_step (shipped)", t, 3 * FWD_GF)

    print("| variant | ms | img/s | GFLOP/img | TF/s | MFU |")
    print("|---|---|---|---|---|---|")
    for name, t, gf in rows:
        tfs = gf * BS / t
        print(f"| {name} | {t:.2f} | {BS / t * 1e3:.0f} | {gf:.1f} "
              f"| {tfs:.0f} | {tfs / PEAK_TFS:.0%} |")


if __name__ == "__main__":
    main()
