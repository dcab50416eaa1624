"""Post-training int8 quantization for TPU serving.

The reference zoo is inference-only f32; on v5e the int8 MXU path doubles
matmul/conv throughput over bf16 (measured ~386 TOP/s vs ~197 TFLOP/s
peak), which is what makes the A100-TensorRT-class resnet50 serving target
reachable on one chip. See ``ptq`` for the mechanism (flax method
interception — no per-model code).
"""

from .ptq import calibrate_int8, int8_apply_fn, quantize_model

__all__ = ["calibrate_int8", "int8_apply_fn", "quantize_model"]
