from odc_tpu.utils.metrics import JsonlLogger, Throughput

__all__ = ["JsonlLogger", "Throughput"]
