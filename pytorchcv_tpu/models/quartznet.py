"""QuartzNet, TPU-native. Behavioral reference: pytorchcv
``models/quartznet.py`` (11 language variants calling get_jasper with
time-channel-separable (depthwise) blocks)."""

from __future__ import annotations

from .jasper import get_jasper
from .registry import register_model

__all__ = []

_VOCABS = {
    "en": " abcdefghijklmnopqrstuvwxyz'",
    "fr": " abcdefghijklmnopqrstuvwxyz'çéâêîôûàèùëïüÿ",
    "de": " abcdefghijklmnopqrstuvwxyzäöüß",
    "it": " abcdefghijklmnopqrstuvwxyz'àéèíìîóòúù",
    "es": " abcdefghijklmnopqrstuvwxyz'áéíóúñü",
    "ca": " abcdefghijklmnopqrstuvwxyz'àéèíïóòúüŀ",
    "pl": " aąbcćdeęfghijklłmnńoóprsśtuwyzźż",
    "ru": " абвгдеёжзийклмнопрстуфхцчшщъыьэюя",
    "ru34": " абвгдежзийклмнопрстуфхцчшщъыьэюя",
}

_VARIANTS = [
    ("quartznet5x5_en_ls", "5x5", "en", 29),
    ("quartznet15x5_en", "15x5", "en", 29),
    ("quartznet15x5_en_nr", "15x5", "en", 29),
    ("quartznet15x5_fr", "15x5", "fr", 43),
    ("quartznet15x5_de", "15x5", "de", 32),
    ("quartznet15x5_it", "15x5", "it", 39),
    ("quartznet15x5_es", "15x5", "es", 36),
    ("quartznet15x5_ca", "15x5", "ca", 39),
    ("quartznet15x5_pl", "15x5", "pl", 34),
    ("quartznet15x5_ru", "15x5", "ru", 35),
    ("quartznet15x5_ru34", "15x5", "ru34", 34),
]

for _name, _size, _lang, _nc in _VARIANTS:
    def _make(size=_size, lang=_lang, nc=_nc):
        def ctor(num_classes: int = nc, **kwargs):
            return get_jasper(version=("quartznet", size), use_dw=True,
                              vocabulary=list(_VOCABS[lang]),
                              num_classes=num_classes, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
