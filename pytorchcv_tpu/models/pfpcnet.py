"""PFPCNet for 3D face reconstruction, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/pfpcnet.py`` (PFPCNet:13,
get_pfpcnet:100). Input: grayscale (B, 320, 240, 1); output: (B, vertices,
3) mesh positions through a PCA-sized bottleneck."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, lambda_batchnorm2d
from ..nn.base import dense_kernel_init
from .registry import register_model

__all__ = ["PFPCNet", "get_pfpcnet"]


class PFPCNet(nn.Module):
    """PFPCNet (reference pfpcnet.py:13)."""

    channels: Any = ()
    pca_size: int = 120
    use_bn: bool = True
    in_channels: int = 1
    in_size: Tuple[int, int] = (320, 240)
    vertices: int = 5023

    @nn.compact
    def __call__(self, x, train: bool = False):
        normalization = lambda_batchnorm2d() if self.use_bn else None
        stages = []
        for i, channels_per_stage in enumerate(self.channels):
            units = tuple(conv3x3_block(
                out_channels=oc, stride=(2 if j == 0 else 1),
                normalization=normalization, name=f"unit{j + 1}",
                parent=None)
                for j, oc in enumerate(channels_per_stage))
            stages.append(Sequential(layers=units, name=f"stage{i + 1}",
                                     parent=None))
        x = Sequential(layers=tuple(stages), name="encoder")(x, train=train)
        # torch NCHW flatten order
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dropout(rate=0.2, deterministic=not train)(x)
        x = Sequential(layers=(
            nn.Dense(self.pca_size, kernel_init=dense_kernel_init,
                     name="fc1", parent=None),
            nn.Dense(3 * self.vertices, kernel_init=dense_kernel_init,
                     name="fc2", parent=None),
        ), name="decoder")(x, train=train)
        return x.reshape(x.shape[0], -1, 3)


def get_pfpcnet(**kwargs) -> PFPCNet:
    """Config expander (reference pfpcnet.py:100)."""
    layers = [2, 2, 2, 2, 2, 2]
    channels_per_layers = [64, 96, 144, 216, 324, 486]
    channels = tuple(tuple([ci] * li)
                     for ci, li in zip(channels_per_layers, layers))
    return PFPCNet(channels=channels, pca_size=120, **kwargs)


@register_model("pfpcnet")
def pfpcnet(**kwargs):
    return get_pfpcnet(**kwargs)
