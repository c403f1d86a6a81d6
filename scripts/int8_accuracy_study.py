"""Non-overfit int8 accuracy study on the REAL chip (VERDICT r2 weak#2).

Protocol: synthetic VOC-style set, 256 train / 64 HELD-OUT val images at
416x416; YOLOv2 trained with on-device augmentation (data device-resident —
the dev relay's ~7 MB/s H2D makes host-fed epochs unusable here, see
CLAUDE.md); then val mAP@.5 / mAP[.5:.95] for bf16, int8_neck and the full
calibrated int8 engine (asymmetric activations).  Also records the train
step time with the round-3 two-pass warp so PROFILE.md gets the real-chip
device-augmentation row.

Usage:
  python scripts/int8_accuracy_study.py [epochs] [warp_impl] [lr] [conf] \
      [size] [full|norot|noaug] [qat_epochs] [qat_lr] [state_ckpt]
Writes /tmp/int8_study.json and prints a markdown table.

``state_ckpt``: path to cache the trained TrainState — if the file
exists, training is skipped and the state is loaded (the synthetic data,
calibration slice and val split are deterministic, so all downstream
rows reproduce); otherwise the state is saved there after training.
Lets the QAT phase iterate without retraining.

With ``qat_epochs > 0`` the study appends the QAT phase (round 4): a
short quantization-aware fine-tune (``odc_tpu.ops.qat``, exact=True —
the loss is evaluated on the DEPLOYED engine bitwise, activation scales
frozen to the calibration) and re-measures the same val rows, i.e. how
much of PTQ's mAP@.5 gap the fine-tune recovers.

Protocol notes: the backbone trains FROM SCRATCH (no pretrained weights in
this environment), so the task must be sized to be learnable from 256
images — at 416² with the full ±45° rotation augmentation the model stays
near-random even at 150 epochs (measured: mAP@.5 0.02); at 256² with
flips/scale/translate/color on and rotation off it converges.  The int8
DELTA on a non-overfit val split is the deliverable, not absolute mAP.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
WARP_IMPL = sys.argv[2] if len(sys.argv) > 2 else "auto"
BASE_LR = float(sys.argv[3]) if len(sys.argv) > 3 else 2e-3
CONF_THRE = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
SIZE = int(sys.argv[5]) if len(sys.argv) > 5 else 416
AUG = sys.argv[6] if len(sys.argv) > 6 else "full"  # full|norot|noaug
QAT_EPOCHS = int(sys.argv[7]) if len(sys.argv) > 7 else 0
QAT_LR = float(sys.argv[8]) if len(sys.argv) > 8 else None  # default BASE_LR/20
STATE_CKPT = sys.argv[9] if len(sys.argv) > 9 else None
BS = 64
HW = (SIZE, SIZE)


def build_data(root):
    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc

    make_synthetic_voc(root, num_train=256, num_val=64, image_hw=HW)
    voc = VOC(dataset_dir=root)
    pipe = DetectionPipeline(
        voc.train_dataset, image_hw=HW, batch_size=BS, max_boxes=8,
        shuffle=False, prefetch=0,
    )
    parts = [b for b in pipe]
    host = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *parts)
    return voc, host


def main():
    from odc_tpu.core.ap import APAccumulator
    from odc_tpu.eval import Detector
    from odc_tpu.losses.yolo_loss import Lambdas
    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.augment import AugmentConfig
    from odc_tpu.ops.int8_engine import calibrate
    from odc_tpu.train import TrainState
    from odc_tpu.train.trainer import make_train_step

    print(f"# device: {jax.devices()[0]}  epochs={EPOCHS} warp={WARP_IMPL}",
          file=sys.stderr)
    with tempfile.TemporaryDirectory() as root:
        voc, host = build_data(root)
        t0 = time.time()
        data = jax.tree.map(jnp.asarray, host)  # one-time upload
        jax.block_until_ready(data.image)
        n = int(host.image.shape[0])
        print(f"# uploaded {n} train images in {time.time()-t0:.1f}s",
              file=sys.stderr)

        model = YOLOv2(dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1,) + HW + (3,), jnp.uint8)
        )
        state = TrainState.create(variables)
        step = make_train_step(
            model, "v2", Lambdas(), model.anchors,
            momentum=0.9, weight_decay=5e-4,
            augment_cfg=(
                None if AUG == "noaug"
                else AugmentConfig(p_rotate=0.0 if AUG == "norot" else 0.5)
            ),
            augment_warp_impl=WARP_IMPL,
        )

        @jax.jit
        def slice_batch(data, idx):
            return jax.tree.map(lambda a: jnp.take(a, idx, 0), data)

        rng = jax.random.key(1)
        host_rng = np.random.default_rng(0)
        step_times = []
        losses = [float("nan")]
        if STATE_CKPT and os.path.exists(STATE_CKPT):
            from odc_tpu.train import checkpoint as ckpt_lib

            state = ckpt_lib.restore(STATE_CKPT, state)
            print(f"# loaded trained state from {STATE_CKPT}; skipping "
                  f"training", file=sys.stderr)
            train_epochs = ()
        else:
            train_epochs = range(1, EPOCHS + 1)
        for epoch in train_epochs:
            perm = host_rng.permutation(n)
            ep_losses = []
            t1 = time.time()
            for i in range(0, n - BS + 1, BS):
                batch = slice_batch(data, jnp.asarray(perm[i : i + BS]))
                rng, sub = jax.random.split(rng)
                # 5-epoch linear warmup, then a 0.3x decay at 2/3.
                lr = BASE_LR * min(1.0, epoch / 5.0)
                if epoch > EPOCHS * 2 // 3:
                    lr *= 0.3
                state, metrics = step(state, batch, jnp.float32(lr), sub)
                ep_losses.append(metrics["loss"])
            # ONE sync per epoch (per-step fetches pay the dev relay's D2H
            # round-trip and would triple the apparent step time).
            losses = [float(x) for x in ep_losses]
            if epoch > 1:
                step_times.append((time.time() - t1) / len(ep_losses))
            if epoch % 5 == 0 or epoch == 1:
                print(f"# epoch {epoch}: loss {np.mean(losses):.3f}",
                      file=sys.stderr)

        if STATE_CKPT and not os.path.exists(STATE_CKPT):
            from odc_tpu.train import checkpoint as ckpt_lib

            ckpt_lib.save(STATE_CKPT, state)
            print(f"# saved trained state to {STATE_CKPT}", file=sys.stderr)

        trained = {"params": state.params, "batch_stats": state.batch_stats}
        calib = slice_batch(data, jnp.arange(32)).image
        scales = calibrate(trained, calib)

        # Val images: generated at exactly HW, so scale factor is 1.
        val_imgs = np.stack(
            [voc.val_dataset[i][1] for i in range(len(voc.val_dataset))]
        )
        val_annots = [
            voc.val_dataset[i][2] for i in range(len(voc.val_dataset))
        ]
        val_dev = jnp.asarray(val_imgs)
        jax.block_until_ready(val_dev)

        def val_map(variables=trained, **kw):
            det = Detector(
                model, variables, conf_thre=CONF_THRE, iou_thre=0.5,
                max_keep=32, **kw
            )
            acc = APAccumulator(det.cls_list)
            boxes_b, _c, lbl_b, score_b, keep_b = det.infer_batch_compact(
                val_dev
            )
            for j, annot in enumerate(val_annots):
                keep = keep_b[j]
                acc.add_image(
                    boxes_b[j][keep],
                    [det.cls_list[k] for k in lbl_b[j][keep]],
                    score_b[j][keep],
                    np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4),
                    annot["lbl_list"],
                )
            res = acc.result()
            levels = list(np.asarray(res["level_list"]))
            gt_cls = {l for a in val_annots for l in a["lbl_list"]}
            aps = np.stack([res[c] for c in det.cls_list if c in gt_cls])
            return (
                float(aps[:, levels.index(0.5)].mean()),
                float(aps.mean()),
            )

        rows = {}
        rows["bf16"] = val_map()
        rows["int8_neck"] = val_map(int8_neck=True)
        rows["int8_full"] = val_map(int8_scales=scales)

        # Engine VAL LOSS (the objective QAT optimizes; continuous, far
        # less noisy than 64-image mAP): batched masked-mean yolo_loss of
        # the deployed engine's output on the val split.
        from odc_tpu.data.pipeline import DetectionPipeline

        val_pipe = DetectionPipeline(
            voc.val_dataset, image_hw=HW, batch_size=BS, max_boxes=8,
            mode="v2", shuffle=False, drop_remainder=False, prefetch=0,
        )
        val_batches = [jax.tree.map(jnp.asarray, b) for b in val_pipe]

        def engine_val_loss(variables):
            from odc_tpu.train.qat import make_engine_eval_step
            from odc_tpu.train.trainer import TrainState as TS

            ev = make_engine_eval_step(model, Lambdas(), scales)
            st = TS.create(dict(variables))
            tot, wsum = 0.0, 0.0
            for b in val_batches:
                w = float(np.sum(np.asarray(b.img_id) >= 0))
                tot += float(ev(st, b)) * w
                wsum += w
            return tot / max(wsum, 1.0)

        def float_val_loss(variables):
            from odc_tpu.train.trainer import TrainState as TS
            from odc_tpu.train.trainer import make_eval_step

            ev = make_eval_step(
                model, "v2", Lambdas(), model.anchors,
                val_loss_mode="batched",
            )
            st = TS.create(dict(variables))
            tot, wsum = 0.0, 0.0
            for b in val_batches:
                w = float(np.sum(np.asarray(b.img_id) >= 0))
                tot += float(ev(st, b)) * w
                wsum += w
            return tot / max(wsum, 1.0)

        val_losses = {
            "ptq": engine_val_loss(trained),
            "bf16": float_val_loss(trained),
        }

        qat_step_times = []
        if QAT_EPOCHS:
            from odc_tpu.ops.qat import make_qat_train_step

            qat_lr = QAT_LR if QAT_LR is not None else BASE_LR / 20.0
            aug_cfg = (
                None if AUG == "noaug"
                else AugmentConfig(p_rotate=0.0 if AUG == "norot" else 0.5)
            )
            qat_step = make_qat_train_step(
                model, Lambdas(), scales,
                momentum=0.9, weight_decay=5e-4,
                augment_cfg=aug_cfg, augment_warp_impl=WARP_IMPL,
            )
            # Controlled ablation partner: continued PLAIN training with the
            # same step count / lr / batch sequence — separates the
            # QAT-specific effect (quantization-gap closure) from
            # generic more-training drift on a tiny dataset.
            cont_step = make_train_step(
                model, "v2", Lambdas(), model.anchors,
                momentum=0.9, weight_decay=5e-4,
                augment_cfg=aug_cfg, augment_warp_impl=WARP_IMPL,
            )

            def run_finetune(step_fn, tag):
                # Identical batch order + augmentation draws for both arms.
                arm_host_rng = np.random.default_rng(123)
                arm_rng = jax.random.key(7)
                # Steps donate their state; deep-copy so `trained` (still
                # referenced by the PTQ rows above) survives donation.
                st = TrainState.create(jax.tree.map(jnp.copy, trained))
                final_losses = []
                for epoch in range(1, QAT_EPOCHS + 1):
                    perm = arm_host_rng.permutation(n)
                    ep_losses = []
                    t1 = time.time()
                    for i in range(0, n - BS + 1, BS):
                        batch = slice_batch(
                            data, jnp.asarray(perm[i : i + BS])
                        )
                        arm_rng, sub = jax.random.split(arm_rng)
                        st, metrics = step_fn(
                            st, batch, jnp.float32(qat_lr), sub
                        )
                        ep_losses.append(metrics["loss"])
                    final_losses = [float(x) for x in ep_losses]
                    if tag == "qat" and epoch > 1:
                        qat_step_times.append(
                            (time.time() - t1) / len(ep_losses)
                        )
                    if epoch % 5 == 0 or epoch == 1:
                        print(f"# {tag} epoch {epoch}: loss "
                              f"{np.mean(final_losses):.3f}", file=sys.stderr)
                return (
                    {"params": st.params, "batch_stats": st.batch_stats},
                    final_losses,
                )

            tuned, losses_q = run_finetune(qat_step, "qat")
            rows["int8_full_qat"] = val_map(tuned, int8_scales=scales)
            # What the fine-tune did to the FLOAT model (QAT trains through
            # the engine's codes; its float mAP may drift).
            rows["bf16_after_qat"] = val_map(tuned)
            val_losses["qat"] = engine_val_loss(tuned)
            val_losses["bf16_after_qat"] = float_val_loss(tuned)

            cont, _ = run_finetune(cont_step, "cont")
            rows["int8_full_cont"] = val_map(cont, int8_scales=scales)
            rows["bf16_after_cont"] = val_map(cont)
            val_losses["cont"] = engine_val_loss(cont)
            val_losses["bf16_after_cont"] = float_val_loss(cont)

        out = {
            "epochs": EPOCHS,
            "warp_impl": WARP_IMPL,
            "train_step_ms": float(np.median(step_times) * 1e3)
            if step_times else None,
            "train_img_per_s": float(BS / np.median(step_times))
            if step_times else None,
            # None (not NaN: invalid strict JSON) when training was skipped
            # via a state checkpoint and no losses were recorded.
            "final_train_loss": float(np.mean(losses))
            if np.isfinite(np.mean(losses)) else None,
            "val": {k: {"mAP@.5": v[0], "mAP[.5:.95]": v[1]}
                    for k, v in rows.items()},
            "device": str(jax.devices()[0]),
        }
        out["engine_val_loss"] = val_losses
        if QAT_EPOCHS:
            out["qat"] = {
                "epochs": QAT_EPOCHS,
                "lr": QAT_LR if QAT_LR is not None else BASE_LR / 20.0,
                "final_loss": float(np.mean(losses_q)),
                "step_ms": float(np.median(qat_step_times) * 1e3)
                if qat_step_times else None,
            }
        with open("/tmp/int8_study.json", "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
        print("\n| config | mAP@.5 | mAP[.5:.95] |")
        print("|---|---|---|")
        for k, (a, b) in rows.items():
            print(f"| {k} | {a:.3f} | {b:.3f} |")


if __name__ == "__main__":
    main()
