from odc_tpu.models.yolov1 import YOLOv1
from odc_tpu.models.yolov2 import YOLOv2
from odc_tpu.models.yolov3 import YOLOv3
from odc_tpu.models.registry import get_model, MODEL_REGISTRY

__all__ = ["YOLOv1", "YOLOv2", "YOLOv3", "get_model", "MODEL_REGISTRY"]
