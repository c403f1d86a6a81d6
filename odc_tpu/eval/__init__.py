from odc_tpu.eval.evaluator import (
    Detector,
    evaluate_model,
    evaluate_batched,
    evaluate_batched_native,
)
from odc_tpu.core.ap import APAccumulator

__all__ = [
    "Detector",
    "evaluate_model",
    "evaluate_batched",
    "evaluate_batched_native",
    "APAccumulator",
]
