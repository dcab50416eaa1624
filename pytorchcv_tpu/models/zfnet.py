"""ZFNet, TPU-native. Behavioral reference: pytorchcv ``models/zfnet.py``
(get_zfnet:14, zfnet:72, zfnetb:93) — AlexNet body with 7x7/2 stem."""

from __future__ import annotations

from .alexnet import AlexNet
from .registry import register_model

__all__ = ["get_zfnet"]


def get_zfnet(version: str = "a", **kwargs):
    """Config expander (reference zfnet.py:14)."""
    if version == "a":
        channels = [[96], [256], [384, 384, 256]]
    elif version == "b":
        channels = [[96], [256], [512, 1024, 512]]
    else:
        raise ValueError(f"Unsupported ZFNet version {version}")
    kernel_sizes = [[7], [5], [3, 3, 3]]
    strides = [[2], [2], [1, 1, 1]]
    paddings = [[1], [0], [1, 1, 1]]
    return AlexNet(channels=channels, kernel_sizes=kernel_sizes,
                   strides=strides, paddings=paddings, use_lrn=True,
                   **kwargs)


@register_model("zfnet")
def zfnet(**kwargs):
    return get_zfnet(version="a", **kwargs)


@register_model("zfnetb")
def zfnetb(**kwargs):
    return get_zfnet(version="b", **kwargs)
