from odc_tpu.core.boxes import iou, xyxy_to_cxcywh, cxcywh_to_xyxy
from odc_tpu.core.nms import nms, nms_padded

__all__ = ["iou", "xyxy_to_cxcywh", "cxcywh_to_xyxy", "nms", "nms_padded"]
