"""X-DenseNet, TPU-native. Behavioral reference: pytorchcv
``models/xdensenet.py`` (XConv2d:14, PreXConvBlock:73, pre_xconv1x1_block:140,
pre_xconv3x3_block:172, XDenseUnit:212, XDenseNet:269, get_xdensenet:363).

Expander-graph masked conv: the binary ``mask`` is a non-trainable buffer
(torch requires_grad=False Parameter) multiplied into the kernel at trace
time — XLA folds it into the weight constant for inference."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, Sequential, global_avg_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from .densenet import TransitionBlock, densenet_channels
from .preresnet import PreResActivation, PreResInitBlock
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["XDenseNet", "XDenseUnit", "get_xdensenet", "pre_xconv3x3_block",
           "PreXConvBlock"]


class XConv(nn.Module):
    """Expander-masked conv (reference xdensenet.py:14). The mask lives in
    the ``buffers`` collection (HWIO, like the kernel); random-init uses a
    deterministic per-output-channel expander pattern."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    bias: bool = False
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        kh = kw = self.kernel_size
        kernel = self.param("kernel", conv_kernel_init,
                            (kh, kw, in_channels, self.out_channels))

        def init_mask():
            expand_size = max(in_channels // self.expand_ratio, 1)
            # deterministic expander: output channel o connects to inputs
            # (o*expand_size + k) % in_channels — same density as the
            # reference's randperm (xdensenet.py:55-60).
            o = jnp.arange(self.out_channels)[None, :]
            i = jnp.arange(in_channels)[:, None]
            sel = ((i - o * expand_size) % in_channels) < expand_size
            return jnp.broadcast_to(sel.astype(jnp.float32),
                                    (kh, kw, in_channels, self.out_channels))

        mask = self.variable("buffers", "mask", init_mask)
        w = kernel * mask.value.astype(kernel.dtype)
        import jax.lax as lax
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.stride,) * 2,
            padding=((self.padding,) * 2,) * 2,
            rhs_dilation=(self.dilation,) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class PreXConvBlock(nn.Module):
    """BN -> ReLU -> XConv (reference xdensenet.py:73)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    bias: bool = False
    return_preact: bool = False
    activate: bool = True
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        if self.return_preact:
            x_pre_activ = x
        x = XConv(out_channels=self.out_channels,
                  kernel_size=self.kernel_size, stride=self.stride,
                  padding=self.padding, dilation=self.dilation,
                  bias=self.bias, expand_ratio=self.expand_ratio,
                  name="conv")(x)
        if self.return_preact:
            return x, x_pre_activ
        return x


def pre_xconv1x1_block(out_channels=0, expand_ratio=2, name="conv",
                       parent=None, **kw):
    return PreXConvBlock(out_channels=out_channels, kernel_size=1, padding=0,
                         expand_ratio=expand_ratio, name=name, parent=parent,
                         **kw)


def pre_xconv3x3_block(out_channels=0, expand_ratio=2, name="conv",
                       parent=None, **kw):
    return PreXConvBlock(out_channels=out_channels, kernel_size=3, padding=1,
                         expand_ratio=expand_ratio, name=name, parent=parent,
                         **kw)


class XDenseUnit(nn.Module):
    """X-DenseNet unit (reference xdensenet.py:212)."""

    out_channels: int = 0
    dropout_rate: float = 0.0
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        bn_size = 4
        inc_channels = self.out_channels - x.shape[-1]
        mid_channels = inc_channels * bn_size
        x = pre_xconv1x1_block(out_channels=mid_channels,
                               expand_ratio=self.expand_ratio,
                               name="conv1").clone(parent=self)(
            x, train=train)
        x = pre_xconv3x3_block(out_channels=inc_channels,
                               expand_ratio=self.expand_ratio,
                               name="conv2").clone(parent=self)(
            x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return jnp.concatenate([identity, x], axis=-1)


def XDenseNet(channels, init_block_channels: int, dropout_rate: float = 0.0,
              expand_ratio: int = 2, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """X-DenseNet (reference xdensenet.py:269)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(TransitionBlock(out_channels=in_ch // 2,
                                         name=f"trans{i + 1}"))
            in_ch //= 2
        for j, out_channels in enumerate(channels_per_stage):
            units.append(XDenseUnit(out_channels=out_channels,
                                    dropout_rate=dropout_rate,
                                    expand_ratio=expand_ratio,
                                    name=f"unit{j + 1}"))
            in_ch = out_channels
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_xdensenet(blocks: int, expand_ratio: int = 2, **kwargs):
    """Config expander (reference xdensenet.py:363)."""
    table = {121: (64, 32, [6, 12, 24, 16]), 161: (96, 48, [6, 12, 36, 24]),
             169: (64, 32, [6, 12, 32, 32]), 201: (64, 32, [6, 12, 48, 32])}
    if blocks not in table:
        raise ValueError(f"Unsupported X-DenseNet blocks: {blocks}")
    init_block_channels, growth_rate, layers = table[blocks]
    channels = densenet_channels(init_block_channels, growth_rate, layers)
    return XDenseNet(channels=channels,
                     init_block_channels=init_block_channels,
                     expand_ratio=expand_ratio, **kwargs)


for _b in (121, 161, 169, 201):
    _name = f"xdensenet{_b}_2"

    def _make(blocks=_b):
        def ctor(**kwargs):
            return get_xdensenet(blocks=blocks, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
