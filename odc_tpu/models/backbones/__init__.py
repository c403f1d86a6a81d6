from odc_tpu.models.backbones.darknet19 import Darknet19Backbone
from odc_tpu.models.backbones.darknet53 import Darknet53Backbone
from odc_tpu.models.backbones.googlenet import GoogLeNetBackbone

__all__ = ["Darknet19Backbone", "Darknet53Backbone", "GoogLeNetBackbone"]
