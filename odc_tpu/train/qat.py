"""QAT fine-tune driver: checkpoint -> calibrate -> fine-tune -> tuned ckpt.

The epoch/checkpoint surface mirrors :class:`odc_tpu.train.trainer.Trainer`
(same pipelines, prefetch, JSONL metrics, best/final checkpoints), but the
step is :func:`odc_tpu.ops.qat.make_qat_train_step`: the forward is the
int8 engine's fake-quant float twin (``exact=True``: the loss is evaluated
on the DEPLOYED engine bitwise), BatchNorm statistics stay frozen, and the
activation scales are calibrated ONCE up front and then frozen — they are
part of the deployed artifact, so they ship alongside the tuned weights as
``int8_scales.npy`` (feed it to ``python -m odc_tpu.serve --int8 --scales``).

Per-epoch validation is the ENGINE's loss on the val pipeline (the number
QAT optimizes), with the trainer's batched masked-mean semantics; the best
checkpoint keys off it.  The reference has no quantization story (torch
f32 end-to-end) — this subsystem exists for the TPU serving path.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odc_tpu.losses.yolo_loss import Lambdas, yolo_loss
from odc_tpu.train import checkpoint as ckpt_lib
from odc_tpu.train.trainer import TrainState, _targets_of
from odc_tpu.utils.metrics import JsonlLogger


def calibrate_from_pipeline(variables, pipeline, num_batches: int = 1):
    """Run the engine's activation calibration on the first ``num_batches``
    of a :class:`~odc_tpu.data.pipeline.DetectionPipeline` (un-augmented
    pixels — calibration must see deployment-distribution inputs)."""
    from odc_tpu.ops.int8_engine import calibrate

    images = []
    for i, batch in enumerate(pipeline):
        if i >= num_batches:
            break
        images.append(np.asarray(batch.image))
    if not images:
        raise ValueError("empty pipeline: nothing to calibrate on")
    return calibrate(variables, jnp.asarray(np.concatenate(images, 0)))


def make_engine_eval_step(model, lambdas: Lambdas, scales, stem: str = "s2d"):
    """Jitted val step on the DEPLOYED int8 engine (batched masked-mean
    loss, weighted by real image count by the caller like the trainer's
    ``val_loss_mode='batched'`` path)."""
    from odc_tpu.ops.int8_engine import yolov2_int8_forward

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = {
            "params": state.params, "batch_stats": state.batch_stats
        }
        y = yolov2_int8_forward(
            variables, batch.image, scales=scales, stem=stem,
            num_anchor_box=model.num_anchor_box, num_cls=model.num_cls,
        )
        det = model.decode(y, batch.image.shape[1:3])
        total, _ = yolo_loss(
            det, _targets_of(batch), lambdas, mode="v2",
            anchors=model.anchors,
        )
        return total

    return eval_step


def finetune_qat(
    model,
    state: TrainState,
    train_pipeline,
    val_pipeline,
    scales,
    ckpt_path: str,
    epochs: int = 10,
    lr: float = 1e-4,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    lambdas: Optional[Lambdas] = None,
    augment_cfg=None,
    warp_impl: str = "auto",
    stem: str = "s2d",
    exact: bool = True,
    seed: int = 0,
    mesh=None,
) -> Tuple[TrainState, dict]:
    """Fine-tune ``state`` against the frozen-scales int8 engine.

    Writes ``best_qat_model.ckpt`` (lowest engine val loss),
    ``final_qat_model.ckpt``, ``int8_scales.npy`` and ``metrics.jsonl``
    under ``ckpt_path``.  Returns ``(final_state, history)``.
    """
    from odc_tpu.data.prefetch import device_prefetch
    from odc_tpu.ops.qat import make_qat_train_step

    lambdas = lambdas or Lambdas()
    qat_step = make_qat_train_step(
        model, lambdas, scales,
        momentum=momentum, weight_decay=weight_decay,
        stem=stem, exact=exact,
        augment_cfg=augment_cfg, augment_warp_impl=warp_impl,
    )
    eval_step = make_engine_eval_step(model, lambdas, scales, stem=stem)

    os.makedirs(ckpt_path, exist_ok=True)
    np.save(os.path.join(ckpt_path, "int8_scales.npy"), np.asarray(scales))
    logger = JsonlLogger(os.path.join(ckpt_path, "metrics.jsonl"))

    if mesh is not None:
        from odc_tpu.parallel.mesh import shard_state

        state = shard_state(state, mesh)

    rng = jax.random.key(seed)
    train_hist, val_hist = [], []
    min_val = float("inf")
    for epoch in range(1, epochs + 1):
        losses = []
        seen = 0
        t0 = time.time()
        for batch in device_prefetch(train_pipeline, mesh=mesh):
            seen += batch.image.shape[0]
            rng, sub = jax.random.split(rng)
            state, metrics = qat_step(state, batch, jnp.float32(lr), sub)
            losses.append(metrics["loss"])
        losses = [float(x) for x in losses]
        train_loss = float(np.mean(losses)) if losses else 0.0
        if losses:
            logger.write(
                kind="qat_epoch", epoch=epoch, loss_mean=train_loss, lr=lr,
                images_per_sec=seen / max(time.time() - t0, 1e-9),
            )

        vals, weights = [], []
        for batch in device_prefetch(val_pipeline, mesh=mesh):
            vals.append(eval_step(state, batch))
            weights.append(int(np.sum(np.asarray(batch.img_id) >= 0)))
        if vals:
            v = np.asarray([float(x) for x in vals])
            w = np.asarray(weights, np.float64)
            val_loss = float((v * w).sum() / max(w.sum(), 1.0))
        else:
            val_loss = 0.0
        logger.write(kind="qat_val_epoch", epoch=epoch, loss=val_loss)

        train_hist.append(train_loss)
        val_hist.append(val_loss)
        print(
            f"QAT Epoch: {epoch} --> Training: (Loss Mean: {train_loss})    "
            f"Engine Validation: (Loss: {val_loss})"
        )
        if val_loss < min_val:
            ckpt_lib.save(
                os.path.join(ckpt_path, "best_qat_model.ckpt"), state
            )
            min_val = val_loss

    ckpt_lib.save(os.path.join(ckpt_path, "final_qat_model.ckpt"), state)
    return state, {
        "train_loss_mean_list": train_hist,
        "val_loss_list": val_hist,
    }
