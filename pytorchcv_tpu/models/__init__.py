"""Model zoo. Importing this package registers every model constructor."""

from . import (alexnet, cbamresnet, darknet, darknet53,  # noqa: F401
               densenet, dpn, hrnet, mobilenet, mobilenetv2, mobilenetv3,
               preresnet, resnet, resnext, senet, sepreresnet, seresnet,
               resneta, resnetd, seresnext, shufflenet, shufflenetv2,
               shufflenetv2b, simplepose_coco, sknet, pspnet, deeplabv3,
               fcn8sd,
               squeezenet, vgg, wrn, zfnet)
from .registry import get_constructor, register_model, registered_models

__all__ = ["get_constructor", "register_model", "registered_models"]
