from odc_tpu.ops.decode import decode_v1, decode_v2, Detections

__all__ = ["decode_v1", "decode_v2", "Detections"]
