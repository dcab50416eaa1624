"""LFFD face detector, TPU-native. Behavioral reference: pytorchcv
``models/lffd.py`` (LffdDetectionBranch:16, LffdDetectionBlock:56,
LFFD:105, get_lffd:230). Multi-scale branches tap the Res/PreRes trunk;
the decoder runs one detection block per tap."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import Concurrent, Sequential, conv1x1_block, conv3x3, \
    conv3x3_block
from ..nn.base import Composed
from .preresnet import PreResUnit
from .registry import register_model
from .resnet import ResUnit

__all__ = ["LFFD", "get_lffd"]


class LffdDetectionBranch(nn.Module):
    """1x1 + 1x1 head branch (reference lffd.py:16)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv1x1_block(out_channels=in_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels, bias=True,
                             normalization=None, activation=None,
                             name="conv2")(x, train=train)


class LffdDetectionBlock(nn.Module):
    """Shared 1x1 + bbox/score branches (reference lffd.py:56)."""

    mid_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, name="conv")(x, train=train)
        return Concurrent(layers=(
            LffdDetectionBranch(out_channels=4, name="bbox_branch",
                                parent=None),
            LffdDetectionBranch(out_channels=2, name="score_branch",
                                parent=None),
        ), name="branches")(x, train=train)


class LffdStage(nn.Module):
    """Strided trans conv + residual units with intermediate taps
    (reference lffd.py:150-171). Returns (x, [taps...])."""

    channels: int = 64
    num_layers: int = 1
    int_bends: int = 0
    use_preresnet: bool = False
    stage_idx: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        unit_class = PreResUnit if self.use_preresnet else ResUnit
        x = conv3x3(out_channels=self.channels, stride=2, padding=0,
                    bias=True, name=f"trans{self.stage_idx + 1}")(x)
        outs = []
        for j in range(self.num_layers):
            if self.use_preresnet:
                x = PreResUnit(out_channels=self.channels, bias=True,
                               use_bn=False, bottleneck=False,
                               name=f"unit{j + 1}")(x, train=train)
            else:
                x = ResUnit(out_channels=self.channels, bias=True,
                            normalization=None, bottleneck=False,
                            name=f"unit{j + 1}")(x, train=train)
            if self.num_layers - j <= self.int_bends:
                outs.append(x)
        x = nn.relu(x)
        outs.append(x)
        return x, outs


class LFFD(Composed):
    """LFFD (reference lffd.py:105)."""

    enc_channels: Any = None
    dec_channels: int = 128
    init_block_channels: int = 64
    layers: Any = None
    int_bends: Any = None
    use_preresnet: bool = False
    in_size: Tuple[int, int] = (640, 640)
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Encoder(enc_channels=tuple(self.enc_channels),
                    init_block_channels=self.init_block_channels,
                    layers=tuple(self.layers),
                    int_bends=tuple(self.int_bends),
                    use_preresnet=self.use_preresnet,
                    name="encoder")(x, train=train)
        return LffdDecoder(dec_channels=self.dec_channels,
                           name="decoder")(x, train=train)


class LffdDecoder(nn.Module):
    """Per-tap detection blocks (torch ``decoder`` ParallelConcurent,
    reference lffd.py:173-193)."""

    dec_channels: int = 128

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return [LffdDetectionBlock(mid_channels=self.dec_channels,
                                   name=f"unit{k + 1}")(xi, train=train)
                for k, xi in enumerate(xs)]


class Encoder(nn.Module):
    """Multi-output encoder (reference lffd.py:130-172)."""

    enc_channels: Tuple = ()
    init_block_channels: int = 64
    layers: Tuple = ()
    int_bends: Tuple = ()
    use_preresnet: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.init_block_channels, stride=2,
                          padding=0, bias=True, normalization=None,
                          name="init_block")(x, train=train)
        outs = []
        for i, channels in enumerate(self.enc_channels):
            x, stage_outs = LffdStage(
                channels=channels, num_layers=self.layers[i],
                int_bends=self.int_bends[i],
                use_preresnet=self.use_preresnet, stage_idx=i,
                name=f"stage{i + 1}")(x, train=train)
            outs.extend(stage_outs)
        return outs


def get_lffd(blocks: int, use_preresnet: bool, **kwargs):
    """Config expander (reference lffd.py:230)."""
    if blocks == 20:
        layers = [3, 1, 1, 1, 1]
        enc_channels = [64, 64, 64, 128, 128]
        int_bends = [0, 0, 0, 0, 0]
    elif blocks == 25:
        layers = [4, 2, 1, 3]
        enc_channels = [64, 64, 128, 128]
        int_bends = [1, 1, 0, 2]
    else:
        raise ValueError(f"Unsupported LFFD blocks: {blocks}")
    return LFFD(enc_channels=enc_channels, dec_channels=128,
                init_block_channels=64, layers=layers, int_bends=int_bends,
                use_preresnet=use_preresnet, **kwargs)


@register_model("lffd20x5s320v2_widerface")
def lffd20x5s320v2_widerface(**kwargs):
    return get_lffd(blocks=20, use_preresnet=True, **kwargs)


@register_model("lffd25x8s560v1_widerface")
def lffd25x8s560v1_widerface(**kwargs):
    return get_lffd(blocks=25, use_preresnet=False, **kwargs)
