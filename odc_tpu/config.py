"""Config system.

Mirrors the reference surface (``config.py:2-54``): ``DEVICE``,
``BATCH_SIZE``, ``MODEL_CONFIG``, ``TRAIN_CONFIG`` with identical keys
(``learning_rate_list``, ``num_epoch_list``, ``lambda_xy/wh/conf/noobj/
cls``) — but as typed dataclasses, with the device string generalized to a
mesh spec.

The reference's staged schedule semantics: ``zip(learning_rate_list,
num_epoch_list)`` stages (yolov1.py:1099) plus an epoch-1 per-step warmup
``lr / 10^(1 - progress)`` (yolov1.py:1045-1051).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class MeshConfig:
    """TPU-native replacement for the reference DEVICE string: how to lay
    jax devices onto (data, model) mesh axes.  The reference's
    single-device execution is the degenerate 1x1 mesh."""

    data: int = -1   # -1: all remaining devices on the data axis
    model: int = 1
    platform: Optional[str] = None  # None = jax default backend


@dataclasses.dataclass
class ModelConfig:
    name: str = "YOLOv2"
    # YOLOv1 grid/anchor surface (config.py:7-11).
    num_grid_cell_in_height: int = 7
    num_grid_cell_in_width: int = 7
    num_anchor_box: int = 2
    num_cls: int = 20
    image_size: Tuple[int, int] = (416, 416)
    compute_dtype: str = "bfloat16"  # MXU-native; "float32" for parity runs


@dataclasses.dataclass
class TrainConfig:
    learning_rate_list: List[float] = dataclasses.field(
        default_factory=lambda: [1e-3, 1e-4, 1e-5]
    )
    num_epoch_list: List[int] = dataclasses.field(
        default_factory=lambda: [60, 30, 70]
    )
    lambda_xy: float = 5.0
    lambda_wh: float = 5.0
    lambda_conf: float = 1.0
    lambda_noobj: float = 0.5
    lambda_cls: float = 1.0

    batch_size: int = 32
    # The reference re-creates SGD each step, which resets momentum buffers
    # so momentum is inert (SURVEY.md note B).  momentum=0.0 reproduces the
    # effective reference update; set 0.9 for the intended behavior.
    momentum: float = 0.0
    weight_decay: float = 5e-4
    warmup_first_epoch: bool = True  # lr/10^(1-progress) over epoch 1
    max_boxes: int = 64
    # Multi-scale training sizes (v2): 32 * (10..19) (yolov2.py:1558).
    multiscale_sizes: Tuple[int, ...] = tuple(32 * s for s in range(10, 20))
    # The reference picks a random size only once, at epoch 1, due to an
    # operator-precedence bug (SURVEY.md note D).  "reference" reproduces
    # that; "every10" implements the intended every-10-epochs behavior.
    multiscale_policy: str = "reference"
    # Epoch val-loss semantics.  "per_image" reproduces the reference's
    # bs=1 validation exactly (each image's masked means divide by its own
    # box count, epoch loss = mean over images — train.py:68-71 +
    # models/yolov1.py:1113-1122); "batched" divides by batch-global
    # counts (weights images by box count — cheaper, non-reference).
    # Best-checkpoint selection keys off this number (yolov1.py:1145-1152).
    val_loss_mode: str = "per_image"
    seed: int = 0


DEVICE = MeshConfig()

BATCH_SIZE = 32

MODEL_CONFIG: Dict[str, ModelConfig] = {
    "YOLOv1": ModelConfig(
        name="YOLOv1",
        num_grid_cell_in_height=7,
        num_grid_cell_in_width=7,
        num_anchor_box=2,
        image_size=(224, 224),  # reference runs v1 at 224 (SURVEY note C)
    ),
    "YOLOv2": ModelConfig(name="YOLOv2", image_size=(416, 416)),
    # Capability extension: the reference's Darknet-53 never got a model
    # attached ("YOLOv3 never built", darknet53.py:127-283).
    "YOLOv3": ModelConfig(
        name="YOLOv3", num_anchor_box=3, image_size=(416, 416)
    ),
}

TRAIN_CONFIG: Dict[str, Dict[str, TrainConfig]] = {
    "YOLOv1": {
        "VOC2012": TrainConfig(
            learning_rate_list=[1e-2, 1e-3, 1e-4],
            num_epoch_list=[150, 60, 60],
        )
    },
    "YOLOv2": {
        "VOC2012": TrainConfig(
            learning_rate_list=[1e-3, 1e-4, 1e-5],
            num_epoch_list=[60, 30, 70],
        )
    },
    # New family: v2's schedule shape; λ keys map to the v3 BCE terms
    # (see odc_tpu.losses.yolov3_loss) with the coord weights at 1.0 —
    # the darknet defaults, not the v1/v2 paper 5.0.
    "YOLOv3": {
        "VOC2012": TrainConfig(
            learning_rate_list=[1e-3, 1e-4, 1e-5],
            num_epoch_list=[60, 30, 70],
            lambda_xy=1.0,
            lambda_wh=1.0,
        )
    },
}


def as_dict(cfg) -> dict:
    """Dataclass -> plain dict (for the train_config.json snapshot the
    reference writes at startup, train.py:46-50)."""
    return dataclasses.asdict(cfg)
