"""Real-chip timing for the device-augmentation warp backends.

Measures, at bs=64 / 416² (the PROFILE.md training-table config):

* the bare geometric warp per impl (oneshot gather / twopass XLA /
  pallas fused kernel);
* the full fused augmentation (warp + color + box transform);
* the complete train step with in-step device augmentation per impl,
  vs the plain step (host-augment equivalent).

Data stays device-resident; sync via tiny scalar fetches (the dev relay's
D2H is ~1 MB/s — CLAUDE.md environment facts).

Usage:  python scripts/profile_warp.py  [bs] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 416


def sync(out):
    """Through the dev relay block_until_ready can return before the device
    finishes (CLAUDE.md) — force a real sync with a tiny D2H fetch."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    print(f"devices: {jax.devices()}  bs={BS} size={SIZE}")
    rng = np.random.default_rng(0)
    h = w = SIZE

    from odc_tpu.ops.augment import AugmentConfig, _sample_affine, augment_batch
    from odc_tpu.ops.warp import warp_affine_oneshot, warp_affine_twopass

    images_f = jax.device_put(
        rng.uniform(0, 255, (BS, h, w, 3)).astype(np.float32)
    )
    images_u8 = jax.device_put(
        rng.integers(0, 255, (BS, h, w, 3), dtype=np.uint8)
    )
    boxes = jax.device_put(
        np.tile(
            np.array([[30, 40, 200, 180], [150, 60, 380, 300]], np.float32),
            (BS, 1, 1),
        )
    )
    valid = jax.device_put(np.ones((BS, 2), bool))
    cfg = AugmentConfig()

    keys = jax.random.split(jax.random.key(0), BS)
    ms = jax.jit(
        jax.vmap(lambda k: _sample_affine(k, cfg, (h, w)))
    )(keys)
    m_invs = jnp.linalg.inv(ms)
    m_invs.block_until_ready()

    # -- bare warps ---------------------------------------------------------
    for name, fn in [
        (
            "warp oneshot (gather)",
            jax.jit(
                lambda im, mi: jax.vmap(
                    lambda a, b: warp_affine_oneshot(a, b, (h, w))
                )(im, mi)
            ),
        ),
        (
            "warp twopass (XLA)",
            jax.jit(
                lambda im, mi: jax.vmap(
                    lambda a, b: warp_affine_twopass(a, b, (h, w))
                )(im, mi)
            ),
        ),
    ]:
        try:
            ms_t = bench(fn, images_f, m_invs)
            print(f"{name:28s} {ms_t:8.2f} ms/batch")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")

    try:
        from odc_tpu.ops.pallas.warp_kernel import warp_affine_pallas

        ms_t = bench(lambda im, mi: warp_affine_pallas(im, mi), images_f, m_invs)
        print(f"{'warp pallas (fused VMEM)':28s} {ms_t:8.2f} ms/batch")
    except Exception as e:
        print(f"{'warp pallas (fused VMEM)':28s} FAILED: {type(e).__name__}: {e}")

    # -- full fused augmentation per impl ------------------------------------
    for impl in ("twopass", "pallas"):
        try:
            fn = jax.jit(
                lambda k, i, b, v, _impl=impl: augment_batch(
                    k, i, b, v, cfg, warp_impl=_impl
                )
            )
            ms_t = bench(fn, jax.random.key(1), images_u8, boxes, valid)
            print(f"{'augment_batch ' + impl:28s} {ms_t:8.2f} ms/batch")
        except Exception as e:
            print(f"{'augment_batch ' + impl:28s} FAILED: {type(e).__name__}: {e}")

    # -- train step ----------------------------------------------------------
    from odc_tpu.data.pipeline import Batch
    from odc_tpu.losses.yolo_loss import Lambdas
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.assign import assign
    from odc_tpu.train.trainer import TrainState, make_train_step

    model = YOLOv2(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.uint8)
    )
    cls = jax.device_put(
        rng.integers(0, 20, (BS, 2)).astype(np.int32)
    )
    tgt = jax.jit(
        lambda b, c, v: assign(b, c, v, (h, w), mode="v2")
    )(boxes, cls, valid)
    batch = Batch(
        image=images_u8, cell=tgt.cell, sig_txty=tgt.sig_txty,
        twth=tgt.twth, box=boxes, cls=cls, valid=valid,
        img_id=jax.device_put(np.arange(BS, dtype=np.int32)),
    )

    def step_ms(aug_cfg, impl):
        # Fresh param copies: the train step donates its input state, and
        # ``variables`` is shared across configs.
        state = TrainState.create(jax.tree.map(jnp.copy, variables))
        step = make_train_step(
            model, "v2", Lambdas(), model.anchors, momentum=0.9,
            weight_decay=5e-4, augment_cfg=aug_cfg,
            augment_warp_impl=impl,
        )

        for i in range(2):
            state, m = step(state, batch, jnp.float32(1e-3), jax.random.key(i))
        sync(m["loss"])
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            state, m = step(state, batch, jnp.float32(1e-3), jax.random.key(i))
        sync(m["loss"])
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"{'train step (no device aug)':28s} {step_ms(None, 'twopass'):8.2f} ms")
    for impl in ("twopass", "pallas"):
        try:
            print(
                f"{'train step + aug ' + impl:28s} "
                f"{step_ms(cfg, impl):8.2f} ms"
            )
        except Exception as e:
            print(f"{'train step + aug ' + impl:28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
