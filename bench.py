"""Headline benchmark: YOLOv2-416 end-to-end inference (decode→NMS),
images/sec on one chip.

Matches the BASELINE.md north-star metric (target ≥ 5000 img/s/chip on TPU
v5e).  The measured program is a single jitted call: uint8 images in →
backbone/neck/head (bfloat16 on the MXU) → fused decode → fixed-shape
class-agnostic NMS (reference thresholds 0.9/0.5) → padded boxes out.

Three configurations are measured:

* ``bf16`` — the reference-parity model, the numerics the parity tests
  prove;
* ``int8_neck`` — dynamic-PTQ int8 on just the 3x3/3072->1024 neck conv;
* ``int8_full`` — the full calibrated int8 PTQ engine
  (``odc_tpu/ops/int8_engine.py``): every conv int8, activations
  requantized with static calibrated scales, the recommended
  high-throughput serving config (error bounded in
  ``tests/test_int8_engine.py``).

The headline ``value`` is the best serving config; the parity number
rides along as ``bf16_value``.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _report_failure(name: str, e: BaseException, failed: list) -> None:
    """A failed config must be machine-visible (VERDICT r4 weak#5): record
    it in ``failed_configs`` and put the actual traceback tail on stderr —
    not just the exception class name."""
    failed.append(name)
    print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    tail = traceback.format_exception(type(e), e, e.__traceback__)[-3:]
    print("".join(tail).rstrip(), file=sys.stderr)

BASELINE_IMAGES_PER_SEC = 5000.0  # BASELINE.json north star
WARMUP_ITERS = 3
TIMED_ITERS = 20

# Persistent compile cache: repeat bench runs (and anything else sharing
# the cache) skip the 20-40 s-per-program TPU compiles.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _measure(infer, variables, images) -> float:
    for _ in range(WARMUP_ITERS):
        out = infer(variables, images)
    np.asarray(out[3])  # full fetch: block_until_ready can return early
    # through the experimental TPU relay, so sync via D2H.
    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        out = infer(variables, images)
    np.asarray(out[3])
    dt = time.perf_counter() - t0
    return images.shape[0] * TIMED_ITERS / dt


def bench_yolov1(batch_sizes=(512, 256, 128), image_size=224,
                 failed=None) -> dict:
    """Secondary benchmark: YOLOv1-224 e2e inference (BASELINE.md config 1:
    the reference's single-image v1 path, here batched).  bf16 only — the
    int8 PTQ engine is v2-specific (see PROFILE.md 'int8 and YOLOv1' for the
    roofline argument: v1 serving is FC-weight-bandwidth-bound, and the
    dominant 205M-param head is already bf16-fetch-limited)."""
    from odc_tpu.models import YOLOv1
    from odc_tpu.ops.detect import make_infer_fn

    model = YOLOv1(dtype=jnp.bfloat16)
    infer = jax.jit(
        make_infer_fn(model, conf_thre=0.9, iou_thre=0.5, max_keep=64)
    )
    rng = np.random.default_rng(1)
    init_img = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
    variables = jax.jit(model.init)(jax.random.key(0), init_img)

    last_err = None
    for bs in batch_sizes:
        try:
            images = jnp.asarray(
                rng.integers(
                    0, 255, (bs, image_size, image_size, 3), dtype=np.uint8
                )
            )
            ips = _measure(infer, variables, images)
            return {"yolov1_value": round(ips, 1), "yolov1_batch_size": bs}
        except Exception as e:  # OOM at large bs: try the next size down
            last_err = e
            print(f"# v1 bs={bs} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    _report_failure("yolov1", last_err, failed if failed is not None else [])
    return {"yolov1_value": None, "yolov1_batch_size": None}


def bench_yolov3(batch_sizes=(256, 128, 64), image_size=416,
                 failed=None) -> dict:
    """Secondary benchmark: YOLOv3-416 e2e inference (three-scale FPN head,
    decode+NMS over all 10 647 boxes).  Capability extension — the
    reference never built YOLOv3 (dead Darknet-53 backbone), so there is
    no baseline config for it; the number documents the family's
    single-chip serving rate.  Serving precision: dynamic int8 on the
    wide 3x3s (``YOLOv3(int8_dynamic=True)``), measured 2 084 -> 2 558
    img/s over bf16 on the v5e (PROFILE.md "int8 on YOLOv3's shapes")."""
    from odc_tpu.models import YOLOv3
    from odc_tpu.ops.detect import make_infer_fn

    model = YOLOv3(dtype=jnp.bfloat16, image_size=(image_size, image_size),
                   int8_dynamic=True)
    infer = jax.jit(
        make_infer_fn(model, conf_thre=0.9, iou_thre=0.5, max_keep=64)
    )
    rng = np.random.default_rng(2)
    init_img = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
    variables = jax.jit(model.init)(jax.random.key(0), init_img)

    last_err = None
    for bs in batch_sizes:
        try:
            images = jnp.asarray(
                rng.integers(
                    0, 255, (bs, image_size, image_size, 3), dtype=np.uint8
                )
            )
            ips = _measure(infer, variables, images)
            return {"yolov3_value": round(ips, 1), "yolov3_batch_size": bs}
        except Exception as e:  # OOM at large bs: try the next size down
            last_err = e
            print(f"# v3 bs={bs} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    _report_failure("yolov3", last_err, failed if failed is not None else [])
    return {"yolov3_value": None, "yolov3_batch_size": None}


def run(batch_sizes=(1024, 512, 256, 128, 64), extra=None,
        failed=None) -> dict:
    if failed is None:
        failed = []
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.detect import make_infer_fn

    model = YOLOv2(dtype=jnp.bfloat16)
    infer_bf16 = jax.jit(
        make_infer_fn(model, conf_thre=0.9, iou_thre=0.5, max_keep=64)
    )
    infer_int8 = jax.jit(
        make_infer_fn(
            model, conf_thre=0.9, iou_thre=0.5, max_keep=64, int8_neck=True
        )
    )

    rng = np.random.default_rng(0)
    init_img = jnp.zeros((1, 416, 416, 3), jnp.uint8)
    variables = jax.jit(model.init)(jax.random.key(0), init_img)

    def make_full_int8():
        from odc_tpu.ops.int8_engine import calibrate

        calib = jnp.asarray(
            rng.integers(0, 255, (32, 416, 416, 3), dtype=np.uint8)
        )
        scales = calibrate(variables, calib)
        return jax.jit(
            make_infer_fn(
                model, conf_thre=0.9, iou_thre=0.5, max_keep=64,
                int8_scales=scales,
            )
        )

    best = best_bf16 = best_int8 = best_full = 0.0
    best_bs = None
    successes = 0
    neck_failed = full_failed = False
    try:
        infer_full = make_full_int8()
    except Exception as e:
        _report_failure("yolov2_int8_full_calibration", e, failed)
        full_failed = True
        infer_full = None
    for bs in batch_sizes:
        if successes >= 2:
            break  # two largest working batch sizes measured; best wins
        try:
            images = jnp.asarray(
                rng.integers(0, 255, (bs, 416, 416, 3), dtype=np.uint8)
            )
            ips_bf16 = _measure(infer_bf16, variables, images)
        except Exception as e:  # OOM at large batch: fall through
            print(f"# bs={bs} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        successes += 1
        try:
            ips_int8 = _measure(infer_int8, variables, images)
        except Exception as e:  # int8 path unavailable: bf16 still counts
            _report_failure(f"yolov2_int8_neck@bs{bs}", e, failed)
            neck_failed = True
            ips_int8 = 0.0
        ips_full = 0.0
        if infer_full is not None:
            try:
                ips_full = _measure(infer_full, variables, images)
            except Exception as e:
                _report_failure(f"yolov2_int8_full@bs{bs}", e, failed)
                full_failed = True
        if extra is not None:
            extra[bs] = {
                "int8_full": ips_full, "int8_neck": ips_int8, "bf16": ips_bf16,
            }
        if max(ips_full, ips_int8, ips_bf16) > best:
            best = max(ips_full, ips_int8, ips_bf16)
            best_bf16 = ips_bf16
            best_int8 = ips_int8
            best_full = ips_full
            best_bs = bs

    return {
        "metric": "YOLOv2-416 e2e inference (decode+NMS) throughput",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / BASELINE_IMAGES_PER_SEC, 3),
        "batch_size": best_bs,
        "precision": (
            "full int8 PTQ engine (calibrated)"
            if best == best_full and best > best_bf16
            else "bf16 + int8 dynamic-PTQ neck conv"
            if best > best_bf16
            else "bf16"
        ),
        "bf16_value": round(best_bf16, 1),
        # null (not 0.0) when a config failed: a regression must be
        # machine-distinguishable from a slow measurement (VERDICT r4 #8).
        "int8_neck_value": (
            None if best_int8 == 0.0 and neck_failed else round(best_int8, 1)
        ),
        "int8_full_value": (
            None if best_full == 0.0 and full_failed else round(best_full, 1)
        ),
        "device": str(jax.devices()[0]),
        "failed_configs": failed,
    }


if __name__ == "__main__":
    failed: list = []
    result = run(failed=failed)
    try:
        result.update(bench_yolov1(failed=failed))
    except Exception as e:  # a secondary config must not kill the headline
        _report_failure("yolov1_setup", e, failed)
        result.update({"yolov1_value": None, "yolov1_batch_size": None})
    try:
        result.update(bench_yolov3(failed=failed))
    except Exception as e:
        _report_failure("yolov3_setup", e, failed)
        result.update({"yolov3_value": None, "yolov3_batch_size": None})
    result["failed_configs"] = failed
    print(json.dumps(result))
