"""Model zoo. Importing this package registers every model constructor."""

from . import (mobilenet, mobilenetv2, mobilenetv3, preresnet,  # noqa: F401
               resnet, shufflenet, shufflenetv2, shufflenetv2b)
from .registry import get_constructor, register_model, registered_models

__all__ = ["get_constructor", "register_model", "registered_models"]
