"""odc_tpu — a TPU-native (JAX / XLA / Pallas / pjit) object-detection framework.

A ground-up rebuild of the capabilities of
``hcnoh/object-detection-collection-pytorch`` (YOLOv1 / YOLOv2 on Pascal VOC),
designed TPU-first:

* NHWC conv backbones (Darknet-19, GoogLeNet, Darknet-53) compiled onto the MXU,
* fully static shapes — targets are compact padded ``[B, MAX_BOXES, ...]``
  tensors instead of the reference's ragged per-box dense grid maps,
* fused on-device box decode + fixed-shape greedy NMS (no host round-trip
  between pixels and boxes),
* data parallelism via ``jax.sharding.Mesh`` + XLA collectives.

The observable behavior (decode formulas, target assignment, the five-part
masked-mean YOLO loss, NMS suppression order, VOC mAP rule) matches the
reference; see SURVEY.md for the file:line map of every reproduced semantic.
"""

__version__ = "0.1.0"
