"""Model registry: the reference selects models by editing a hardcoded
string (``train.py:22``); here the same names resolve through a registry."""

from __future__ import annotations

from typing import Any, Dict

from odc_tpu.models.yolov1 import YOLOv1
from odc_tpu.models.yolov2 import YOLOv2
from odc_tpu.models.yolov3 import YOLOv3

MODEL_REGISTRY: Dict[str, Any] = {
    "YOLOv1": YOLOv1,
    "YOLOv2": YOLOv2,
    "YOLOv3": YOLOv3,
}


def get_model(name: str, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](**kwargs)
