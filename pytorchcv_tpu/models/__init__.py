"""Model zoo. Importing this package registers every model constructor."""

from . import preresnet, resnet  # noqa: F401
from .registry import get_constructor, register_model, registered_models

__all__ = ["get_constructor", "register_model", "registered_models"]
