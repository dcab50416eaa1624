"""DIA-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/diaresnet.py`` (FirstLSTMAmp:16, DIALSTMCell:51, DIAAttention:108,
DIAResUnit:152, DIAResNet:243, get_diaresnet:330).

The DIA attention LSTM is SHARED across all units of a stage (torch keeps
one instance registered under every unit; here the stage owns it once and
threads the (h, c) state through the units — linen's native module
sharing, with the converter resolving torch's per-unit alias keys)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv1x1_block, global_avg_pool2d
from ..nn.base import Composed, call_block, dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck, ResInitBlock
from .shell import ImageClassifier

__all__ = ["DIAResNet", "get_diaresnet", "DIAAttention", "DIAResUnit",
           "build_dia_stage"]


class FirstLSTMAmp(nn.Module):
    """Bottlenecked fc amplifier for the first LSTM layer
    (reference diaresnet.py:16)."""

    out_features: int = 0

    @nn.compact
    def __call__(self, x):
        mid_features = x.shape[-1] // 4
        x = nn.Dense(mid_features, kernel_init=dense_kernel_init,
                     name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_features, kernel_init=dense_kernel_init,
                        name="fc2")(x)


class AmpSeq(nn.Module):
    """Indexable stack of amplifiers (torch ``x_amps``/``h_amps``
    Sequential, reference diaresnet.py:70-80)."""

    num_layers: int = 1
    out_features: int = 0

    def setup(self):
        amps = []
        for i in range(self.num_layers):
            if i == 0:
                amps.append(FirstLSTMAmp(out_features=self.out_features,
                                         name=f"amp{i + 1}"))
            else:
                amps.append(nn.Dense(self.out_features,
                                     kernel_init=dense_kernel_init,
                                     name=f"amp{i + 1}"))
        self.amps = amps

    def __call__(self, x, i: int):
        return self.amps[i](x)


class DIALSTMCell(nn.Module):
    """DIA-LSTM cell (reference diaresnet.py:51)."""

    in_h_features: int = 0
    num_layers: int = 1
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, h, c, train: bool = False):
        out_features = 4 * self.in_h_features
        x_amps = AmpSeq(num_layers=self.num_layers,
                        out_features=out_features, name="x_amps")
        h_amps = AmpSeq(num_layers=self.num_layers,
                        out_features=out_features, name="h_amps")
        hy, cy = [], []
        for i in range(self.num_layers):
            gates = x_amps(x, i) + h_amps(h[i], i)
            i_gate, f_gate, c_gate, o_gate = jnp.split(gates, 4, axis=-1)
            i_gate = nn.sigmoid(i_gate)
            f_gate = nn.sigmoid(f_gate)
            c_gate = jnp.tanh(c_gate)
            o_gate = nn.sigmoid(o_gate)
            cy_i = f_gate * c[i] + i_gate * c_gate
            hy_i = o_gate * nn.sigmoid(cy_i)
            cy.append(cy_i)
            hy.append(hy_i)
            x = hy_i
            if train and self.dropout_rate > 0:
                x = nn.Dropout(rate=self.dropout_rate,
                               deterministic=False)(x)
        return hy, cy


class DIAAttention(nn.Module):
    """Dense-and-implicit attention (reference diaresnet.py:108)."""

    in_x_features: int = 0
    in_h_features: int = 0
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hc=None, train: bool = False):
        w = x.mean(axis=(1, 2))
        if hc is None:
            h = [jnp.zeros_like(w)] * self.num_layers
            c = [jnp.zeros_like(w)] * self.num_layers
        else:
            h, c = hc
        h, c = DIALSTMCell(in_h_features=self.in_h_features,
                           num_layers=self.num_layers,
                           name="lstm")(w, h, c, train=train)
        w = h[-1][:, None, None, :]
        return x * w, (h, c)


class DIAResUnit(nn.Module):
    """DIA-ResNet unit; the attention module is passed in BOUND (shared
    across the stage's units; reference diaresnet.py:152)."""

    out_channels: int = 0
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, hc, attention, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            body = ResBottleneck(out_channels=self.out_channels,
                                 stride=self.stride, padding=self.padding,
                                 dilation=self.dilation,
                                 conv1_stride=self.conv1_stride, name="body")
        else:
            body = ResBlock(out_channels=self.out_channels,
                            stride=self.stride, name="body")
        x = body(x, train=train)
        x, hc = attention(x, hc, train=train)
        return nn.relu(x + identity), hc


class DIAStage(Composed):
    """A stage of DIA units threading shared attention state."""

    units: Any = None
    attention_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        attention = DIAAttention(in_x_features=self.attention_channels,
                                 in_h_features=self.attention_channels,
                                 name="attention")
        hc = None
        for unit in self.units:
            m = self.adopt(unit)
            x, hc = m(x, hc, attention, train=train)
        return x


def build_dia_stage(channels_per_stage, in_index, unit_ctor, name):
    """Build one DIA stage; ``unit_ctor(j, out_channels)`` returns an
    unbound unit module."""
    units = [unit_ctor(j, oc) for j, oc in enumerate(channels_per_stage)]
    return DIAStage(units=tuple(units),
                    attention_channels=channels_per_stage[0], name=name)


def DIAResNet(channels, init_block_channels: int, bottleneck: bool,
              conv1_stride: bool, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """DIA-ResNet (reference diaresnet.py:243)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        def unit_ctor(j, oc, i=i):
            stride = 2 if (j == 0) and (i != 0) else 1
            return DIAResUnit(out_channels=oc, stride=stride,
                              bottleneck=bottleneck,
                              conv1_stride=conv1_stride,
                              name=f"unit{j + 1}", parent=None)
        layers.append(build_dia_stage(channels_per_stage, i, unit_ctor,
                                      f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_diaresnet(blocks: int, bottleneck: bool = None,
                  conv1_stride: bool = True, width_scale: float = 1.0,
                  **kwargs):
    """Config expander (reference diaresnet.py:330)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    table = {
        (10, False): [1, 1, 1, 1], (12, False): [2, 1, 1, 1],
        (14, False): [2, 2, 1, 1], (14, True): [1, 1, 1, 1],
        (16, False): [2, 2, 2, 1], (18, False): [2, 2, 2, 2],
        (26, False): [3, 3, 3, 3], (26, True): [2, 2, 2, 2],
        (34, False): [3, 4, 6, 3], (38, True): [3, 3, 3, 3],
        (50, True): [3, 4, 6, 3], (101, True): [3, 4, 23, 3],
        (152, True): [3, 8, 36, 3], (200, True): [3, 24, 36, 3],
    }
    key = (blocks, bool(bottleneck))
    if key not in table:
        raise ValueError(f"Unsupported DIA-ResNet blocks: {blocks}")
    layers = table[key]
    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale)
                     if (i != len(channels) - 1) or (j != len(ci) - 1)
                     else cij for j, cij in enumerate(ci)]
                    for i, ci in enumerate(channels)]
        init_block_channels = int(init_block_channels * width_scale)
    return DIAResNet(channels=channels,
                     init_block_channels=init_block_channels,
                     bottleneck=bottleneck, conv1_stride=conv1_stride,
                     **kwargs)


_VARIANTS = [
    ("diaresnet10", dict(blocks=10)),
    ("diaresnet12", dict(blocks=12)),
    ("diaresnet14", dict(blocks=14)),
    ("diaresnetbc14b", dict(blocks=14, bottleneck=True, conv1_stride=False)),
    ("diaresnet16", dict(blocks=16)),
    ("diaresnet18", dict(blocks=18)),
    ("diaresnet26", dict(blocks=26, bottleneck=False)),
    ("diaresnetbc26b", dict(blocks=26, bottleneck=True, conv1_stride=False)),
    ("diaresnet34", dict(blocks=34)),
    ("diaresnetbc38b", dict(blocks=38, bottleneck=True, conv1_stride=False)),
    ("diaresnet50", dict(blocks=50)),
    ("diaresnet50b", dict(blocks=50, conv1_stride=False)),
    ("diaresnet101", dict(blocks=101)),
    ("diaresnet101b", dict(blocks=101, conv1_stride=False)),
    ("diaresnet152", dict(blocks=152)),
    ("diaresnet152b", dict(blocks=152, conv1_stride=False)),
    ("diaresnet200", dict(blocks=200)),
    ("diaresnet200b", dict(blocks=200, conv1_stride=False)),
]

for _name, _cfg in _VARIANTS:
    def _make(cfg=_cfg):
        def ctor(**kwargs):
            return get_diaresnet(**cfg, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
