"""Public entry point: ``get_model(name, pretrained=...)`` (analog of
reference ``model_provider.py:1364``)."""

from __future__ import annotations

from typing import Any

from .model import Model
from .models import get_constructor, registered_models


def get_model(name: str, pretrained: bool = False, init: bool = True,
              rng: int = 0, **kwargs) -> Model:
    """Build a zoo model by registered name.

    Returns a :class:`Model` with initialized variables (unless
    ``init=False`` and ``pretrained=False``). ``pretrained=True`` downloads
    the reference's released ``.pth`` checkpoint (SHA1-verified, cached) and
    converts it into NHWC variables.
    """
    ctor = get_constructor(name)
    module = ctor(**kwargs)
    model = Model(name=name.lower(), module=module)
    if pretrained:
        model = model.init(rng)
        from .zoo.store import load_pretrained
        model = load_pretrained(model)
    elif init:
        model = model.init(rng)
    return model


# Familiar alias matching the reference package's import idiom.
ptcv_get_model = get_model

__all__ = ["get_model", "ptcv_get_model", "registered_models"]
