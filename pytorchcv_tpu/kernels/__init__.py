"""Pallas TPU kernels for the framework's hot paths.

Each kernel has an XLA fallback with identical numerics; dispatch picks the
Pallas path on TPU backends (or when forced via ``interpret=True`` for
CPU-side testing).

Modules
-------
preprocess  — fused ImageNet eval pipeline (uint8 -> resize -> center-crop
              -> normalize -> bf16), resize expressed as two interpolation
              matmuls on the MXU (north-star requirement; reference protocol
              README.md:157-167).
dwconv      — fused depthwise conv + folded-BN scale/shift + activation
              (the mobilenet-family hot loop, reference common/conv.py:437+).
attention   — fused windowed multi-head attention (ProPainter
              SparseWindowAttention inner product, reference
              propainter.py:315-506; DANet position attention).
"""

from .preprocess import (IMAGENET_MEAN, IMAGENET_STD, classification_preprocess,
                         preprocess_batch, resize_matrices)
from .dwconv import dwconv2d_bn_act
from .attention import fused_window_attention
from .flash_attention import flash_attention

__all__ = [
    "IMAGENET_MEAN", "IMAGENET_STD", "classification_preprocess",
    "preprocess_batch", "resize_matrices", "dwconv2d_bn_act",
    "fused_window_attention", "flash_attention",
]
