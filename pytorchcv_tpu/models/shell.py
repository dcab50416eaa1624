"""Generic model shells.

Model builder functions compose unbound linen modules (containers + blocks)
eagerly in plain Python — outside any module scope — and wrap them in one of
these shells. Adoption into the parameter tree happens lazily at first call,
so the same builder code composes freely (backbone slicing, head swaps).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.base import Composed

__all__ = ["ImageClassifier"]


class ImageClassifier(Composed):
    """features -> flatten -> output head (the reference's universal
    classifier shape, e.g. resnet.py:266-336)."""

    features: Any = None
    output: Any = None
    in_size: Tuple[int, int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 1000
    output_before_flatten: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.adopt_call(self.features, x, train=train)
        if self.output_before_flatten:
            # conv-style head applied on the (B, 1, 1, C) pooled feature
            # (e.g. MobileNetV2's 1x1-conv classifier, mobilenetv2.py:139)
            if self.output is not None:
                x = self.adopt_call(self.output, x, train=train)
            return _flatten_torch_order(x)
        x = _flatten_torch_order(x)
        if self.output is not None:
            x = self.adopt_call(self.output, x, train=train)
        return x


def _flatten_torch_order(x):
    """Flatten to (B, -1) in NCHW element order, so classifier weights map
    1:1 from reference checkpoints even when the pooled feature keeps
    spatial extent (VGG/AlexNet flatten 7x7 maps). Free when spatial is 1x1."""
    if x.ndim == 4 and (x.shape[1] > 1 or x.shape[2] > 1):
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(x.shape[0], -1)
