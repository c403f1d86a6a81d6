"""Jitted train/eval steps + the epoch/stage training driver.

TPU-native rework of the reference train loop (``models/yolov1.py:933-1173``,
``models/yolov2.py:1142-1387``):

* one compiled ``train_step`` per image size: forward (bf16 on the MXU) →
  fused decode → loss → backward → SGD update, all on device; the only
  host↔device traffic is the input batch in and a scalar metrics dict out
  (vs the reference's per-box H2D puts and per-step D2H loss sync);
* optimizer = torch-SGD semantics (grad + wd·p into a momentum buffer).
  The reference rebuilds its optimizer every step which silently zeroes
  momentum (SURVEY.md note B) — ``momentum=0.0`` reproduces that effective
  update; 0.9 gives the intended one;
* staged LRs with the epoch-1 warmup curve (schedule.py);
* per-epoch validation loss, best/final checkpoints, loss-history pickle
  and a ``train_config.json`` snapshot — same artifact layout as the
  reference (yolov1.py:1145-1173, train.py:46-50) plus restore/resume,
  which the reference lacks (SURVEY.md §5);
* multi-scale policy for v2 ("reference": size picked only at epoch 1,
  reproducing note D; "every10": the intended behavior).

Deliberate deviation (SURVEY.md note D tail): the reference validates v2
at NATIVE image size with bs=1 (an accident of its missing val resize,
``models/yolov2.py:1404-1426`` + ``train.py:68-71``) — one compiled
executable per unique image size, bs=1 device usage.  Here validation runs
batched at the pipeline's static size; the reference-contract native-size
path lives in ``Detector.detect`` / ``evaluate_model`` where per-image
box parity actually matters.

Data parallelism: the step is an ordinary ``jax.jit`` program — run under a
``Mesh`` with the batch sharded on the "data" axis (``odc_tpu.parallel``),
XLA inserts the gradient ``psum`` over ICI.
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from odc_tpu.config import TrainConfig, as_dict
from odc_tpu.losses.yolo_loss import Lambdas, yolo_loss
from odc_tpu.ops.assign import YoloTargets
from odc_tpu.train import checkpoint as ckpt_lib
from odc_tpu.train.schedule import StagedSchedule
from odc_tpu.utils.metrics import JsonlLogger


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    momentum: Any
    step: jax.Array

    @classmethod
    def create(cls, variables) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            momentum=jax.tree.map(jnp.zeros_like, params),
            step=jnp.zeros((), jnp.int32),
        )


def _targets_of(batch) -> YoloTargets:
    return YoloTargets(
        cell=batch.cell, sig_txty=batch.sig_txty, twth=batch.twth,
        box=batch.box, cls=batch.cls, valid=batch.valid,
    )


def make_train_step(
    model,
    mode: str,
    lambdas: Lambdas,
    anchors=None,
    momentum: float = 0.0,
    weight_decay: float = 5e-4,
    augment_cfg=None,
    augment_warp_impl: str = "auto",
) -> Callable:
    """Build the jitted train step: (state, batch, lr, rng) -> (state, metrics).

    With ``augment_cfg`` set, the fused on-device augmentation
    (``odc_tpu.ops.augment``) runs inside the step and targets are
    re-assigned on device from the augmented boxes — the full
    pixels-to-gradients path is one XLA program.
    ``augment_warp_impl``: geometric-warp backend ("auto" default: the
    fused Pallas VMEM kernel on real TPU, the XLA twopass elsewhere;
    "oneshot" is the gather oracle — see
    ``odc_tpu.ops.augment._warp_images``).
    """

    def loss_fn(params, batch_stats, batch, rng):
        image = batch.image
        targets = _targets_of(batch)
        if augment_cfg is not None:
            from odc_tpu.ops.assign import assign
            from odc_tpu.ops.augment import augment_batch

            rng, aug_key = jax.random.split(rng)
            image, boxes, valid = augment_batch(
                aug_key, image, batch.box, batch.valid, augment_cfg,
                warp_impl=augment_warp_impl,
            )
            targets = assign(
                boxes, batch.cls, valid, image.shape[1:3], mode=mode
            )

        variables = {"params": params, "batch_stats": batch_stats}
        y, mut = model.apply(
            variables, image, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        if mode == "v3":
            from odc_tpu.losses.yolov3_loss import yolov3_loss

            total, parts = yolov3_loss(
                y, targets, image.shape[1:3], anchors=anchors,
                lambdas=lambdas,
            )
        else:
            det = model.decode(y, image.shape[1:3])
            total, parts = yolo_loss(
                det, targets, lambdas, mode=mode, anchors=anchors
            )
        return total, (parts, mut["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        # torch-SGD update: d = g + wd*p; buf = mu*buf + d; p -= lr*buf.
        new_mom = jax.tree.map(
            lambda b, g, p: momentum * b + g + weight_decay * p,
            state.momentum, grads, state.params,
        )
        new_params = jax.tree.map(
            lambda p, b: p - lr * b, state.params, new_mom
        )
        metrics = {
            "loss": loss,
            "loss_xy": parts.xy,
            "loss_wh": parts.wh,
            "loss_conf": parts.conf,
            "loss_noobj": parts.noobj,
            "loss_cls": parts.cls,
        }
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                momentum=new_mom,
                step=state.step + 1,
            ),
            metrics,
        )

    return train_step


def make_eval_step(
    model,
    mode: str,
    lambdas: Lambdas,
    anchors=None,
    val_loss_mode: str = "per_image",
) -> Callable:
    """Build the jitted val step.

    ``val_loss_mode="per_image"`` returns ``(loss_sum, image_count)`` with
    reference-exact bs=1 semantics (per-image denominators, see
    :func:`odc_tpu.losses.yolo_loss.yolo_loss_per_image`); ``"batched"``
    returns the batch-global masked-mean loss (one scalar)."""
    from odc_tpu.losses.yolo_loss import yolo_loss_per_image

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        y = model.apply(variables, batch.image, train=False)
        targets = _targets_of(batch)
        if mode == "v3":
            from odc_tpu.losses.yolov3_loss import (
                yolov3_loss, yolov3_loss_per_image,
            )

            if val_loss_mode == "per_image":
                losses, has_box = yolov3_loss_per_image(
                    y, targets, batch.image.shape[1:3], anchors=anchors,
                    lambdas=lambdas,
                )
                return jnp.sum(losses), jnp.sum(has_box.astype(jnp.float32))
            total, _ = yolov3_loss(
                y, targets, batch.image.shape[1:3], anchors=anchors,
                lambdas=lambdas,
            )
            return total
        det = model.decode(y, batch.image.shape[1:3])
        if val_loss_mode == "per_image":
            losses, has_box = yolo_loss_per_image(
                det, targets, lambdas, mode=mode, anchors=anchors
            )
            return jnp.sum(losses), jnp.sum(has_box.astype(jnp.float32))
        total, _ = yolo_loss(
            det, targets, lambdas, mode=mode, anchors=anchors
        )
        return total

    return eval_step


class Trainer:
    """Epoch/stage driver mirroring the reference ``train_model`` surface."""

    def __init__(
        self,
        model,
        train_pipeline,
        val_pipeline,
        config: TrainConfig,
        ckpt_path: str,
        mode: Optional[str] = None,
        rng_seed: Optional[int] = None,
        augment_cfg=None,
        mesh=None,
        eval_map_every: int = 0,
        eval_map_conf_thre: float = 0.05,
    ) -> None:
        if not getattr(train_pipeline, "drop_remainder", True):
            raise ValueError(
                "train pipeline must use drop_remainder=True: padded tail "
                "rows are zero images that would feed BatchNorm batch "
                "statistics in train mode (padding is eval-only)"
            )
        self.model = model
        self.train_pipeline = train_pipeline
        self.val_pipeline = val_pipeline
        self.config = config
        self.ckpt_path = ckpt_path
        self.mode = mode or {
            "YOLOv1": "v1", "YOLOv3": "v3"
        }.get(type(model).__name__, "v2")
        self.anchors = (
            getattr(model, "anchors", None)
            if self.mode in ("v2", "v3") else None
        )
        self.lambdas = Lambdas(
            config.lambda_xy, config.lambda_wh, config.lambda_conf,
            config.lambda_noobj, config.lambda_cls,
        )
        self.schedule = StagedSchedule(
            config.learning_rate_list,
            config.num_epoch_list,
            config.warmup_first_epoch,
        )
        self.rng = jax.random.key(
            config.seed if rng_seed is None else rng_seed
        )
        self.train_step = make_train_step(
            model, self.mode, self.lambdas, self.anchors,
            momentum=config.momentum, weight_decay=config.weight_decay,
            augment_cfg=augment_cfg,
        )
        self.eval_step = make_eval_step(
            model, self.mode, self.lambdas, self.anchors,
            val_loss_mode=getattr(config, "val_loss_mode", "per_image"),
        )
        self.val_loss_mode = getattr(config, "val_loss_mode", "per_image")
        self.mesh = mesh
        # mAP-during-training hook: the reference left its in-training
        # evaluation commented out (``train.py:79``); here it is a real
        # capability — every ``eval_map_every`` epochs run the streaming
        # batched VOC mAP over the val pipeline's dataset, log the scores
        # to metrics.jsonl, and keep a best-by-mAP checkpoint alongside
        # best-by-val-loss.  ``eval_map_conf_thre`` defaults low (0.05):
        # mAP needs the full precision-recall curve, and the reference's
        # 0.9 detect default keeps almost nothing early in training.
        self.eval_map_every = int(eval_map_every)
        self.eval_map_conf_thre = float(eval_map_conf_thre)
        self._map_detector = None  # built lazily on first use
        os.makedirs(ckpt_path, exist_ok=True)
        self.logger = JsonlLogger(os.path.join(ckpt_path, "metrics.jsonl"))

    def init_state(self, image_hw=None) -> TrainState:
        h, w = image_hw or self.train_pipeline.image_hw
        dummy = jnp.zeros((1, h, w, 3), jnp.uint8)
        variables = jax.jit(self.model.init)(jax.random.key(0), dummy)
        return TrainState.create(variables)

    # -- epochs ------------------------------------------------------------

    def run_train_epoch(self, state: TrainState, epoch: int):
        from odc_tpu.data.prefetch import device_prefetch

        losses = []
        dataset_size = len(self.train_pipeline.dataset)
        seen = 0
        t0 = time.time()
        for batch in device_prefetch(self.train_pipeline, mesh=self.mesh):
            seen += batch.image.shape[0]
            lr = self.schedule.step_lr(epoch, seen / dataset_size)
            self.rng, sub = jax.random.split(self.rng)
            state, metrics = self.train_step(
                state, batch, jnp.float32(lr), sub
            )
            losses.append(metrics["loss"])
        # One host sync at epoch end, not per step (reference syncs per
        # step, yolov1.py:1065).
        losses = [float(x) for x in losses]
        if losses:
            dt = time.time() - t0
            self.logger.write(
                kind="train_epoch", epoch=epoch,
                loss_mean=float(np.mean(losses)),
                lr=self.schedule.stage_lr(epoch),
                images_per_sec=seen / max(dt, 1e-9),
            )
        return state, float(np.mean(losses)) if losses else 0.0

    def run_val_epoch(self, state: TrainState, epoch: int) -> float:
        from odc_tpu.data.prefetch import device_prefetch

        losses, weights = [], []
        for batch in device_prefetch(self.val_pipeline, mesh=self.mesh):
            if self.val_loss_mode == "per_image":
                # Reference-exact: eval_step returns (Σ per-image losses,
                # #images with boxes); padded tail rows have no boxes and
                # count zero.  Epoch loss = mean over images, each with its
                # own denominators (train.py:68-71).
                s, n = self.eval_step(state, batch)
                losses.append(s)
                weights.append(n)
            else:
                losses.append(self.eval_step(state, batch))
                # Padded tail rows carry img_id == -1 and no valid boxes;
                # weight each batch by its real image count so the epoch
                # loss covers exactly len(val_dataset) images.
                weights.append(int(np.sum(np.asarray(batch.img_id) >= 0)))
        if not losses:
            return 0.0
        losses = np.asarray([float(x) for x in losses])
        weights = np.asarray([float(x) for x in weights], np.float64)
        if self.val_loss_mode == "per_image":
            val = float(losses.sum() / max(weights.sum(), 1.0))
        else:
            val = float((losses * weights).sum() / max(weights.sum(), 1.0))
        self.logger.write(kind="val_epoch", epoch=epoch, loss=val)
        return val

    def run_map_eval(self, state: TrainState, epoch: int) -> dict:
        """Streaming batched VOC mAP on the val dataset (the productionized
        version of the reference's commented-out ``evaluate_model`` call,
        ``train.py:79``).  Returns ``{"map_50": ..., "map_50_95": ...}`` and
        writes a ``kind="map_eval"`` row to metrics.jsonl."""
        from odc_tpu.eval import Detector, evaluate_batched

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if self._map_detector is None:
            self._map_detector = Detector(
                self.model, variables, conf_thre=self.eval_map_conf_thre
            )
        else:
            # One Detector (one compiled program) for the whole run; only
            # the weights change between evaluations.
            self._map_detector.variables = variables
        t0 = time.time()
        result = evaluate_batched(
            self._map_detector,
            self.val_pipeline.dataset,
            image_hw=self.val_pipeline.image_hw,
            batch_size=self.val_pipeline.batch_size,
        )
        aps = np.stack([result[c] for c in self._map_detector.cls_list])
        scores = {
            "map_50": float(aps[:, 0].mean()),
            "map_50_95": float(aps.mean()),
        }
        self.logger.write(
            kind="map_eval", epoch=epoch, eval_seconds=time.time() - t0,
            **scores,
        )
        return scores

    # -- full run ------------------------------------------------------------

    def _maybe_multiscale(self, epoch: int) -> None:
        # v2 per the reference (note D); v3 trains multi-scale in darknet
        # too, so the capability extends to it.
        if self.mode not in ("v2", "v3") or not self.config.multiscale_sizes:
            return
        policy = self.config.multiscale_policy
        repick = (
            epoch == 1 if policy == "reference" else (epoch - 1) % 10 == 0
        )
        if repick:
            size = int(
                np.random.default_rng(self.config.seed + epoch).choice(
                    self.config.multiscale_sizes
                )
            )
            self.train_pipeline.set_image_size((size, size))

    def fit(self, state: Optional[TrainState] = None) -> Tuple[TrainState, dict]:
        if state is None:
            state = self.init_state()
        if self.mesh is not None:
            from odc_tpu.parallel.mesh import shard_state

            state = shard_state(state, self.mesh)

        with open(
            os.path.join(self.ckpt_path, "train_config.json"), "w"
        ) as f:
            import json

            json.dump(as_dict(self.config), f, indent=4, default=str)

        train_hist, val_hist = [], []
        min_val = float("inf")
        best_map = -1.0

        for epoch in self.schedule.epochs():
            self._maybe_multiscale(epoch)
            state, train_loss = self.run_train_epoch(state, epoch)
            val_loss = self.run_val_epoch(state, epoch)
            train_hist.append(train_loss)
            val_hist.append(val_loss)
            print(
                f"Epoch: {epoch} --> Training: (Loss Mean: {train_loss})    "
                f"Validation: (Loss: {val_loss})"
            )
            if val_loss < min_val:
                ckpt_lib.save(
                    os.path.join(self.ckpt_path, "best_model.ckpt"), state
                )
                min_val = val_loss
            if self.eval_map_every and epoch % self.eval_map_every == 0:
                scores = self.run_map_eval(state, epoch)
                print(
                    f"Epoch: {epoch} --> mAP@.5: {scores['map_50']:.4f}  "
                    f"mAP[.5:.95]: {scores['map_50_95']:.4f}"
                )
                if scores["map_50_95"] > best_map:
                    ckpt_lib.save(
                        os.path.join(self.ckpt_path, "best_map_model.ckpt"),
                        state,
                    )
                    best_map = scores["map_50_95"]

        ckpt_lib.save(os.path.join(self.ckpt_path, "final_model.ckpt"), state)
        history = {
            "train_loss_mean_list": train_hist,
            "val_loss_list": val_hist,
        }
        with open(
            os.path.join(self.ckpt_path, "training_result.pkl"), "wb"
        ) as f:
            pickle.dump(history, f)
        return state, history
