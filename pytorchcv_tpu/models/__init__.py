"""Model zoo. Importing this package registers every model constructor."""

from . import (airnet, alexnet, bagnet, bamresnet, bninception,  # noqa: F401
               cbamresnet, condensenet, cub, diapreresnet,
               diapreresnet_cifar, diaresnet, diaresnet_cifar, dla, drn,
               hardnet, selecsls,
               sparsenet, xdensenet, xdensenet_cifar,
               darknet, darknet53, diracnetv2, ibnbresnet, ibndensenet,
               ibnresnet, ibnresnext, inceptionresnetv1,
               resnesta, scnet,
               inceptionresnetv2, inceptionv3, inceptionv4, menet,
               squeezenext, xception,
               densenet_cifar, fractalnet_cifar, nin_cifar, preresnet_cifar,
               pyramidnet, resdropresnet_cifar, rir_cifar,
               shakedropresnet_cifar, shakeshakeresnet_cifar, wrn1bit_cifar,
               pyramidnet_cifar, resnet_cifar, resnext_cifar,
               sepreresnet_cifar,
               ror_cifar, seresnet_cifar, wrn_cifar,
               densenet, dpn, hrnet, mobilenet, mobilenetv2, mobilenetv3,
               preresnet, resnet, resnext, senet, sepreresnet, seresnet,
               resneta, resnetd, seresnext, shufflenet, shufflenetv2,
               shufflenetv2b, simplepose_coco, simpleposemobile_coco,
               alphapose_coco, fastseresnet, lwopenpose_cmupan,
               sknet, pspnet, deeplabv3,
               efficientnet, efficientnetedge, enet, fbnet, fcn8sd, ghostnet,
               bisenet, centernet, cgnet, icnet, lffd, contextnet, dabnet, danet, edanet, erfnet,
               esnet, fastscnn,
               fpenet, lednet,
               linknet, segnet, sqnet, espcnet, unet,
               igcv3, jasper, jasperdr, quartznet, mixnet, mnasnet,
               peleenet,
               proxylessnas, spnasnet,
               regnet, vovnet,
               squeezenet, vgg, wrn, zfnet)
from .registry import get_constructor, register_model, registered_models

__all__ = ["get_constructor", "register_model", "registered_models"]
