"""Jasper DR (dense residual), TPU-native. Behavioral reference: pytorchcv
``models/jasperdr.py`` (jasperdr10x5_en:16, jasperdr10x5_en_nr:44)."""

from __future__ import annotations

from .jasper import EN_VOCAB, get_jasper
from .registry import register_model

__all__ = ["jasperdr10x5_en", "jasperdr10x5_en_nr"]


@register_model("jasperdr10x5_en")
def jasperdr10x5_en(num_classes: int = 29, **kwargs):
    return get_jasper(version=("jasper", "10x5"), use_dr=True,
                      vocabulary=EN_VOCAB, num_classes=num_classes, **kwargs)


@register_model("jasperdr10x5_en_nr")
def jasperdr10x5_en_nr(num_classes: int = 29, **kwargs):
    return get_jasper(version=("jasper", "10x5"), use_dr=True,
                      vocabulary=EN_VOCAB, num_classes=num_classes, **kwargs)
