"""Export a trained checkpoint as a self-contained serving engine.

    python -m odc_tpu.serve --model YOLOv2 \
        --ckpt ckpts/YOLOv2/<ts>/best_model.ckpt --out yolov2.odce \
        --image-size 416 --batch-size 256 [--int8] [--calib images.npy]

The checkpoint is the trainer's full-state msgpack (``best_model.ckpt`` /
``final_model.ckpt``) or a params-only artifact (``--params-only``).
``--int8`` runs PTQ calibration (on ``--calib``, a uint8 [N,H,W,3] .npy,
or on synthetic images when omitted — prefer real calibration data) and
bakes the scales into the artifact.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="YOLOv2",
                   choices=["YOLOv1", "YOLOv2", "YOLOv3"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--params-only", action="store_true",
                   help="--ckpt is a save_params artifact, not a TrainState")
    p.add_argument("--out", required=True)
    p.add_argument("--image-size", type=int, default=None,
                   help="square input size (default: 224 v1 / 416 v2)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--dynamic-batch", action="store_true",
                   help="export with a symbolic batch dimension: one "
                   "artifact serves every batch size (one device compile "
                   "per distinct size at load time)")
    p.add_argument("--conf-thre", type=float, default=0.9)
    p.add_argument("--iou-thre", type=float, default=0.5)
    p.add_argument("--max-keep", type=int, default=64)
    p.add_argument("--class-wise", action="store_true")
    p.add_argument("--compact", action="store_true",
                   help="per-box (label, score) outputs instead of the "
                   "full class-score tensor (5x less output traffic)")
    p.add_argument("--int8", action="store_true",
                   help="full-int8 PTQ engine (YOLOv2 only)")
    p.add_argument("--int8-dynamic", action="store_true",
                   help="dynamic int8 on the wide 3x3s (YOLOv3 only; no "
                   "calibration — measured 2084 -> 2558 img/s on v5e, "
                   "PROFILE.md 'int8 on YOLOv3's shapes')")
    p.add_argument("--int8-stem", default="s2d",
                   choices=["plain", "s2d", "s2d2"])
    p.add_argument("--calib", default=None,
                   help="uint8 [N,H,W,3] .npy for int8 calibration")
    p.add_argument("--scales", default=None,
                   help="precomputed [22,2] activation-scale .npy (e.g. "
                   "the int8_scales.npy a QAT fine-tune wrote — QAT "
                   "weights are only valid with THEIR frozen scales); "
                   "skips calibration")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. tpu,cpu")
    p.add_argument("--weights-dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="cast baked weights (bfloat16 halves the artifact; "
                   "the bf16 compute path casts them anyway)")
    return p.parse_args()


def main():
    args = parse_args()
    from odc_tpu.config import MODEL_CONFIG
    from odc_tpu.models import get_model
    from odc_tpu.serve import export_engine, save_engine
    from odc_tpu.train import checkpoint
    from odc_tpu.train.trainer import TrainState

    size = args.image_size or (224 if args.model == "YOLOv1" else 416)
    cfg = MODEL_CONFIG[args.model]
    if args.model == "YOLOv1":
        model = get_model(
            "YOLOv1",
            num_grid_cell_in_height=cfg.num_grid_cell_in_height,
            num_grid_cell_in_width=cfg.num_grid_cell_in_width,
            num_anchor_box=cfg.num_anchor_box,
            image_size=(size, size),
        )
    else:
        kw = {}
        if args.int8_dynamic:
            if args.model != "YOLOv3":
                raise SystemExit("--int8-dynamic is YOLOv3-only "
                                 "(ConvBnLeaky.int8_dynamic; v2 ships the "
                                 "full PTQ engine via --int8)")
            kw["int8_dynamic"] = True
        model = get_model(args.model, image_size=(size, size), **kw)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.uint8)
    )
    if args.params_only:
        params = checkpoint.restore_params(args.ckpt, variables["params"])
        variables = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
        }
    else:
        state = checkpoint.restore(args.ckpt, TrainState.create(variables))
        variables = {
            "params": state.params, "batch_stats": state.batch_stats
        }

    int8_scales = None
    if args.int8:
        if args.model != "YOLOv2":
            raise SystemExit("--int8 is YOLOv2-only (see PROFILE.md "
                             "'int8 and YOLOv1')")
        from odc_tpu.ops.int8_engine import calibrate

        if args.scales:
            int8_scales = jnp.asarray(np.load(args.scales), jnp.float32)
        elif args.calib:
            calib_imgs = jnp.asarray(np.load(args.calib), jnp.uint8)
            if calib_imgs.shape[1:3] != (size, size):
                raise SystemExit(
                    f"calibration images must be [N, {size}, {size}, 3]"
                )
        else:
            print("WARNING: no --calib given; calibrating on synthetic "
                  "noise (use real images for deployment)")
            calib_imgs = jax.random.randint(
                jax.random.key(1), (8, size, size, 3), 0, 256, jnp.int32
            ).astype(jnp.uint8)
        if int8_scales is None:
            int8_scales = calibrate(variables, calib_imgs)

    data = export_engine(
        model,
        variables,
        batch_size=None if args.dynamic_batch else args.batch_size,
        image_hw=(size, size),
        conf_thre=args.conf_thre,
        iou_thre=args.iou_thre,
        max_keep=args.max_keep,
        class_wise=args.class_wise,
        compact=args.compact,
        int8_scales=int8_scales,
        int8_stem=args.int8_stem,
        platforms=(
            args.platforms.split(",") if args.platforms else None
        ),
        weights_dtype=(
            jnp.dtype(args.weights_dtype) if args.weights_dtype else None
        ),
    )
    save_engine(args.out, data)
    bs = "dynamic" if args.dynamic_batch else args.batch_size
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB "
          f"({'int8' if args.int8 else 'bf16'}, bs={bs}, "
          f"{size}x{size})")


if __name__ == "__main__":
    main()
