"""Training entry point.

Mirrors the reference driver (``train.py:21-83``): builds
``ckpts/<model>/<timestamp>``, constructs the VOC dataset, snapshots
``train_config.json``, instantiates the model and loaders, and runs the
staged training schedule — but model selection is a CLI flag instead of an
edit-the-source string (reference ``train.py:22``), execution is laid out
over a (data, model) device mesh, and augmentation runs fused on device.

    python train.py --model YOLOv2 --dataset-dir datasets
    python train.py --model YOLOv1 --synthetic --epochs 1   # smoke run
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="YOLOv1",
                   choices=["YOLOv1", "YOLOv2", "YOLOv3"])
    p.add_argument("--dataset-dir", default="datasets")
    p.add_argument("--ckpt-root", default="ckpts")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None,
                   help="override: single stage of N epochs")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--momentum", type=float, default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--image-size", type=int, default=None,
                   help="square input-size override, multiple of 32 "
                   "(default: the model config's 224 v1 / 416 v2 — the "
                   "reference's resolution axis, yolov2.py:1557-1571)")
    p.add_argument("--no-augment", action="store_true",
                   help="shorthand for --augment none")
    p.add_argument(
        "--augment", default="host", choices=["host", "device", "none"],
        help="host: reference-order augmentation on CPU, overlapped with "
        "device compute via the prefetch thread (default; geometric warps "
        "are gather-bound and slow on the TPU itself). device: fused "
        "in-step augmentation (one XLA program; see PROFILE.md caveat). "
        "none: disable.",
    )
    p.add_argument("--data-parallel", type=int, default=-1,
                   help="devices on the data mesh axis (-1: all)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the JAX platform (use 'cpu' for smoke runs: "
                   "some environments pin jax_platforms programmatically at "
                   "interpreter start, so the JAX_PLATFORMS env var alone "
                   "may be overridden)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate and train on a tiny synthetic VOC")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--eval-map", action="store_true",
                   help="run batched VOC mAP after training")
    p.add_argument("--eval-map-every", type=int, default=0, metavar="N",
                   help="run streaming batched VOC mAP on the val set every "
                   "N epochs during training (the reference left this "
                   "commented out, train.py:79); logs kind='map_eval' rows "
                   "to metrics.jsonl and keeps best_map_model.ckpt")
    p.add_argument("--eval-map-conf", type=float, default=0.05,
                   help="confidence threshold for --eval-map-every (low "
                   "default: mAP needs the full PR curve)")
    p.add_argument("--qat", default=None, metavar="CKPT",
                   help="QAT mode (YOLOv2 only): fine-tune this trained "
                   "checkpoint against the frozen-scales int8 engine "
                   "(odc_tpu.train.qat) instead of training; writes "
                   "best/final_qat_model.ckpt + int8_scales.npy")
    p.add_argument("--qat-epochs", type=int, default=10)
    p.add_argument("--qat-lr", type=float, default=1e-4)
    p.add_argument("--qat-calib-batches", type=int, default=1,
                   help="train batches (un-augmented) to calibrate "
                   "activation scales on")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from odc_tpu.config import BATCH_SIZE, MODEL_CONFIG, TRAIN_CONFIG
    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc
    from odc_tpu.models import get_model
    from odc_tpu.ops.augment import AugmentConfig
    from odc_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
    from odc_tpu.train import Trainer, checkpoint

    # Multi-host pod runs: wire up the processes (no-op single-process);
    # each host's pipelines then read only their slice of every global
    # batch and shard_batch assembles the global arrays.
    maybe_initialize_distributed()
    pidx, pcnt = jax.process_index(), jax.process_count()

    ckpt_path = os.path.join(
        args.ckpt_root,
        args.model,
        datetime.datetime.now().strftime("%Y-%m-%d %H-%M-%S"),
    )
    os.makedirs(ckpt_path, exist_ok=True)

    if args.synthetic:
        make_synthetic_voc(args.dataset_dir, num_train=16, num_val=8)
    dataset = VOC(dataset_dir=args.dataset_dir)

    model_cfg = MODEL_CONFIG[args.model]
    if args.image_size is not None:
        if args.image_size % 32:
            raise SystemExit("--image-size must be a multiple of 32")
        model_cfg.image_size = (args.image_size, args.image_size)
        if args.model == "YOLOv1":
            # v1's grid is size//32 (224 -> S=7, reference config.py:7-11).
            model_cfg.num_grid_cell_in_height = args.image_size // 32
            model_cfg.num_grid_cell_in_width = args.image_size // 32
    train_cfg = TRAIN_CONFIG[args.model]["VOC2012"]
    train_cfg.batch_size = args.batch_size or BATCH_SIZE
    if args.epochs is not None:
        train_cfg.num_epoch_list = [args.epochs]
        train_cfg.learning_rate_list = [
            args.lr or train_cfg.learning_rate_list[0]
        ]
    if args.momentum is not None:
        train_cfg.momentum = args.momentum

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model == "YOLOv1":
        model = get_model(
            "YOLOv1",
            num_grid_cell_in_height=model_cfg.num_grid_cell_in_height,
            num_grid_cell_in_width=model_cfg.num_grid_cell_in_width,
            num_anchor_box=model_cfg.num_anchor_box,
            image_size=model_cfg.image_size,
            dtype=dtype,
        )
    else:
        model = get_model(
            args.model, image_size=model_cfg.image_size, dtype=dtype
        )

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"mesh: {dict(mesh.shape)}  devices: {len(jax.devices())}")

    aug_mode = "none" if args.no_augment else args.augment
    host_augment = None
    if aug_mode == "host":
        from odc_tpu.data.host_augment import reference_augment

        host_augment = reference_augment

    train_pipe = DetectionPipeline(
        dataset.train_dataset,
        image_hw=model_cfg.image_size,
        batch_size=train_cfg.batch_size,
        max_boxes=train_cfg.max_boxes,
        mode={"YOLOv1": "v1", "YOLOv3": "v3"}.get(args.model, "v2"),
        seed=train_cfg.seed,
        augment=host_augment,
        process_index=pidx,
        process_count=pcnt,
    )
    val_pipe = DetectionPipeline(
        dataset.val_dataset,
        image_hw=model_cfg.image_size,
        batch_size=train_cfg.batch_size,
        max_boxes=train_cfg.max_boxes,
        mode={"YOLOv1": "v1", "YOLOv3": "v3"}.get(args.model, "v2"),
        shuffle=False,
        # Validate over EVERY image like the reference (train.py:68-71);
        # the tail batch is padded, not dropped.
        drop_remainder=False,
        process_index=pidx,
        process_count=pcnt,
    )

    augment_cfg = AugmentConfig() if aug_mode == "device" else None

    if args.qat:
        if args.model != "YOLOv2":
            raise SystemExit("--qat is YOLOv2-only (the int8 engine "
                             "hardcodes the Darknet-19/quadrant graph; "
                             "see PROFILE.md 'int8 and YOLOv1')")
        from odc_tpu.train.qat import calibrate_from_pipeline, finetune_qat

        state = checkpoint.restore(
            args.qat,
            Trainer(
                model, train_pipe, val_pipe, train_cfg, ckpt_path=ckpt_path,
            ).init_state(),
        )
        # Calibration must see un-augmented deployment-distribution pixels.
        calib_pipe = DetectionPipeline(
            dataset.train_dataset,
            image_hw=model_cfg.image_size,
            batch_size=train_cfg.batch_size,
            max_boxes=train_cfg.max_boxes,
            mode="v2",
            shuffle=False,
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        scales = calibrate_from_pipeline(
            variables, calib_pipe, num_batches=args.qat_calib_batches
        )
        from odc_tpu.losses.yolo_loss import Lambdas

        with mesh:
            state, _ = finetune_qat(
                model, state, train_pipe, val_pipe, scales,
                ckpt_path=ckpt_path, epochs=args.qat_epochs, lr=args.qat_lr,
                # QAT is a new capability, not reference parity: real
                # momentum by default (quirk B applies to Trainer only).
                momentum=(
                    args.momentum if args.momentum is not None else 0.9
                ),
                weight_decay=train_cfg.weight_decay,
                lambdas=Lambdas(
                    train_cfg.lambda_xy, train_cfg.lambda_wh,
                    train_cfg.lambda_conf, train_cfg.lambda_noobj,
                    train_cfg.lambda_cls,
                ),
                augment_cfg=augment_cfg, mesh=mesh,
            )
        print(f"done; QAT checkpoints + int8_scales.npy in {ckpt_path}")
        return

    trainer = Trainer(
        model, train_pipe, val_pipe, train_cfg,
        ckpt_path=ckpt_path, augment_cfg=augment_cfg, mesh=mesh,
        eval_map_every=args.eval_map_every,
        eval_map_conf_thre=args.eval_map_conf,
    )

    state = None
    if args.resume:
        state = checkpoint.restore(args.resume, trainer.init_state())
        print(f"resumed from {args.resume} at step {int(state.step)}")

    with mesh:
        state, history = trainer.fit(state)

    print(f"done; checkpoints in {ckpt_path}")

    if args.eval_map:
        from odc_tpu.eval import Detector, evaluate_batched

        det = Detector(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            cls_list=dataset.cls_list,
        )
        result = evaluate_batched(
            det, dataset.val_dataset, image_hw=model_cfg.image_size,
            batch_size=train_cfg.batch_size,
        )
        import numpy as np

        aps = np.stack([result[c] for c in dataset.cls_list])
        print(f"mAP[.5:.95]: {aps.mean():.4f}  mAP@.5: {aps[:, 0].mean():.4f}")


if __name__ == "__main__":
    main()
