"""CUB-200-2011 fine-grained classification variants, TPU-native.

Behavioral reference: pytorchcv ``models/resnet_cub.py``,
``seresnet_cub.py``, ``mobilenet_cub.py`` (mobilenet + fdmobilenet),
``proxylessnas_cub.py`` — each is the base family's config expander with
``num_classes=200``.
"""

from __future__ import annotations

from .mobilenet import get_fdmobilenet, get_mobilenet
from .proxylessnas import get_proxylessnas
from .registry import register_model
from .resnet import get_resnet
from .seresnet import get_seresnet

__all__ = []


def _variant(name, expander, **cfg):
    @register_model(name)
    def ctor(num_classes: int = 200, **kwargs):
        return expander(num_classes=num_classes, **cfg, **kwargs)
    ctor.__name__ = name
    return ctor


# ResNet / SE-ResNet CUB (reference resnet_cub.py:14-489, seresnet_cub.py).
for _blocks, _bc, _c1s, _tag in [
        (10, None, True, "10"), (12, None, True, "12"),
        (14, None, True, "14"), (14, True, False, "bc14b"),
        (16, None, True, "16"), (18, None, True, "18"),
        (26, False, True, "26"), (26, True, False, "bc26b"),
        (38, True, False, "bc38b"), (34, None, True, "34"),
        (50, None, True, "50"), (50, None, False, "50b"),
        (101, None, True, "101"), (101, None, False, "101b"),
        (152, None, True, "152"), (152, None, False, "152b"),
        (200, None, True, "200"), (200, None, False, "200b")]:
    _variant(f"resnet{_tag}_cub", get_resnet, blocks=_blocks,
             bottleneck=_bc, conv1_stride=_c1s)
    _variant(f"seresnet{_tag}_cub", get_seresnet, blocks=_blocks,
             bottleneck=_bc, conv1_stride=_c1s)

# MobileNet / FD-MobileNet CUB (reference mobilenet_cub.py:17-196).
for _ws, _tag in [(1.0, "w1"), (0.75, "w3d4"), (0.5, "wd2"), (0.25, "wd4")]:
    _variant(f"mobilenet_{_tag}_cub", get_mobilenet, width_scale=_ws)
    _variant(f"fdmobilenet_{_tag}_cub", get_fdmobilenet, width_scale=_ws)

# ProxylessNAS CUB (reference proxylessnas_cub.py:14-154).
for _v in ("cpu", "gpu", "mobile", "mobile14"):
    _variant(f"proxylessnas_{_v}_cub", get_proxylessnas, version=_v)
