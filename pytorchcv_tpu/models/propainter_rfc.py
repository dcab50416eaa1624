"""ProPainter Recurrent Flow Completion (RFC), TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/propainter_rfc.py``
(SecondOrderDeformableAlignment:19, RFCBidirectionalPropagation:101,
ConvBlock3d:204, P3dBlock:263, DilationBlock:324, RFCDecoderUnit:370,
EdgeDetection:423, EncoderUnit:478, InitBlock:516, MainUnit:550,
PPRecurrentFlowComplete:607, calc_bidirectional_opt_flow_completion_by_pprfc:720)
from 'ProPainter: Improving Propagation and Transformer for Video
Inpainting' https://arxiv.org/pdf/2309.03897.

Video layout is (B, T, H, W, C) — directly NDHWC for the P3D conv stack.
The second-order deformable alignment runs on the TPU-native gather+matmul
``deform_conv2d``; the per-frame recurrence has a static trip count (the
streaming engine feeds fixed windows), so it unrolls under jit."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BreakBlock, Hourglass, InterpolationBlock, Sequential,
                  conv1x1, conv3x3_block, lambda_leakyrelu, lambda_relu)
from ..nn.arch import IndexedSeq
from ..nn.base import IntPair, conv_kernel_init, to_2tuple
from ..nn.deform import deform_conv2d
from .registry import register_model
from .resnet import ResBlock, ResUnit

__all__ = ["PPRecurrentFlowComplete", "get_propainter_rfc",
           "calc_bidirectional_opt_flow_completion_by_pprfc",
           "SecondOrderDeformableAlignment", "ConvBlock3d"]


class DeformConv(nn.Module):
    """Modulated deformable conv parameter holder (torchvision
    DeformConv2d layout: weight OIHW -> HWIO kernel + bias)."""

    out_channels: int = 0
    kernel_size: int = 3
    padding: int = 1
    deform_groups: int = 16

    @nn.compact
    def __call__(self, x, offset, mask, center=None, residue_bound=None):
        in_channels = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init,
                            (self.kernel_size, self.kernel_size,
                             in_channels, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,))
        return deform_conv2d(x, offset, mask, kernel, bias, stride=1,
                             padding=self.padding,
                             deform_groups=self.deform_groups,
                             center=center, residue_bound=residue_bound)


class SecondOrderDeformableAlignment(nn.Module):
    """Offset/mask prediction + deformable conv (reference
    propainter_rfc.py:19)."""

    out_channels: int = 0
    deform_groups: int = 16
    max_residue_magnitude: int = 5

    @nn.compact
    def __call__(self, x, cond, flow=None, train: bool = False):
        cond_channels = (self.out_channels, self.out_channels,
                         self.out_channels, 27 * self.deform_groups)
        act = lambda_leakyrelu(0.1)
        y = Sequential(layers=tuple(
            conv3x3_block(out_channels=oc, bias=True, normalization=None,
                          activation=(act if i != len(cond_channels) - 1
                                      else None),
                          name=f"conv{i + 1}", parent=None)
            for i, oc in enumerate(cond_channels)), name="conv_offset")(
                cond, train=train)
        o1, o2, mask = jnp.split(y, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(offset)
        if flow is not None:
            # flow channels are (x, y); deform offsets are (y, x)
            flow_yx = flow[..., ::-1]
            offset = offset + jnp.tile(flow_yx,
                                       (1, 1, 1, offset.shape[-1] // 2))
        mask = jax.nn.sigmoid(mask)
        # Offsets are center + tanh-bounded residual by construction,
        # so nn/deform.py's bounded-offset dispatch applies: on TPU at
        # b==1 it takes the Pallas window sampler (kernels/
        # deform_patch.py, 1.8 vs 18.5 ms at the feat-prop shape);
        # elsewhere it falls through to the measured XLA default (the
        # XLA patch-gather formulation measured SLOWER in context —
        # 980 vs 737 ms transformer window: per-pixel (P,P,C) patches
        # replace gather-index cost with untiled HBM traffic).
        if flow is not None:
            center = flow_yx
        else:
            center = jnp.zeros(x.shape[:3] + (2,), jnp.float32)
        return DeformConv(out_channels=self.out_channels,
                          deform_groups=self.deform_groups,
                          name="deform_conv")(
            x, offset, mask, center=center,
            residue_bound=float(self.max_residue_magnitude))


class RFCBidirectionalPropagation(nn.Module):
    """Second-order bidirectional feature propagation (reference
    propainter_rfc.py:101). Input/output (B, T, H, W, C)."""

    channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        assert c == self.channels
        act = lambda_leakyrelu(0.1)
        # torch ModuleDict scopes: deform_align.{backward_,forward_} etc.
        align_seq = IndexedSeq(layers=tuple(
            SecondOrderDeformableAlignment(
                out_channels=c, deform_groups=16, max_residue_magnitude=5,
                name=m, parent=None) for m in ("backward_", "forward_")),
            name="deform_align")
        backbone_seq = IndexedSeq(layers=tuple(
            ResBlock(out_channels=c, stride=1, bias=True,
                     normalization=None, activation=act, name=m,
                     parent=None) for m in ("backward_", "forward_")),
            name="backbone")
        aligners = {"backward_": lambda xx, cond, train: align_seq(
            xx, 0, cond=cond, train=train),
            "forward_": lambda xx, cond, train: align_seq(
            xx, 1, cond=cond, train=train)}
        backbones = {"backward_": lambda xx, train: backbone_seq(
            xx, 0, train=train),
            "forward_": lambda xx, train: backbone_seq(
            xx, 1, train=train)}

        feats = {"spatial": [x[:, i] for i in range(t)]}
        for module_name in ("backward_", "forward_"):
            feats[module_name] = []
            frame_idx = list(range(t))
            if module_name == "backward_":
                frame_idx = frame_idx[::-1]
            feat_prop = jnp.zeros((b, h, w, c), x.dtype)
            for i, idx in enumerate(frame_idx):
                feat_current = feats["spatial"][idx]
                if i > 0:
                    cond_n1 = feat_prop
                    feat_n2 = jnp.zeros_like(feat_prop)
                    cond_n2 = jnp.zeros_like(cond_n1)
                    if i > 1:
                        feat_n2 = feats[module_name][-2]
                        cond_n2 = feat_n2
                    cond = jnp.concatenate(
                        [cond_n1, feat_current, cond_n2], axis=-1)
                    feat_prop2 = jnp.concatenate([feat_prop, feat_n2],
                                                 axis=-1)
                    feat_prop = aligners[module_name](feat_prop2, cond,
                                                      train)
                feat = [feat_current] + \
                    [feats[k][idx] for k in feats
                     if k not in ("spatial", module_name)] + [feat_prop]
                feat = jnp.concatenate(feat, axis=-1)
                feat_prop = feat_prop + backbones[module_name](feat, train)
                feats[module_name].append(feat_prop)
            if module_name == "backward_":
                feats[module_name] = feats[module_name][::-1]

        fusion = conv1x1(out_channels=c, bias=True, name="fusion")
        outputs = []
        for i in range(t):
            align = jnp.concatenate(
                [feats[k][i] for k in feats if k != "spatial"], axis=-1)
            outputs.append(fusion(align))
        return jnp.stack(outputs, axis=1) + x


class ConvBlock3d(nn.Module):
    """3D conv (NDHWC) + activation (reference propainter_rfc.py:204)."""

    out_channels: int = 0
    kernel_size: Any = 1
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    bias: bool = True
    padding_mode: str = "zeros"
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) \
            else (self.kernel_size,) * 3
        st = self.stride if isinstance(self.stride, tuple) \
            else (self.stride,) * 3
        pd = self.padding if isinstance(self.padding, tuple) \
            else (self.padding,) * 3
        dl = self.dilation if isinstance(self.dilation, tuple) \
            else (self.dilation,) * 3
        if self.padding_mode == "replicate":
            x = jnp.pad(x, ((0, 0), (pd[0], pd[0]), (pd[1], pd[1]),
                            (pd[2], pd[2]), (0, 0)), mode="edge")
            pad = [(0, 0)] * 3
        else:
            pad = [(pd[i], pd[i]) for i in range(3)]
        out_channels, use_bias = self.out_channels, self.bias

        class _Conv3d(nn.Module):
            """Param holder scoped ``conv`` (torch nn.Conv3d child)."""

            @nn.compact
            def __call__(self, x):
                kernel = self.param("kernel", conv_kernel_init,
                                    (*ks, x.shape[-1], out_channels))
                # match flax nn.Conv's dtype promotion so bf16-cast
                # params work with f32 inputs (Model.as_bfloat16)
                x = x.astype(kernel.dtype)
                y = jax.lax.conv_general_dilated(
                    x, kernel, window_strides=st, padding=pad,
                    rhs_dilation=dl,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                if use_bias:
                    y = y + self.param("bias", nn.initializers.zeros,
                                       (out_channels,))
                return y

        y = _Conv3d(name="conv")(x)
        from ..nn.activ import create_activation_layer
        act = create_activation_layer(self.activation, name="activ")
        return act(y) if act is not None else y


def conv1x3x3_block(padding=(0, 1, 1), **kwargs) -> ConvBlock3d:
    return ConvBlock3d(kernel_size=(1, 3, 3), padding=padding, **kwargs)


class P3dBlock(nn.Module):
    """(1,3,3) + dilated (3,1,1) conv pair (reference
    propainter_rfc.py:263)."""

    out_channels: int = 0
    stride: int = 1
    activation: Any = lambda_relu()
    final_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x3x3_block(out_channels=self.out_channels,
                            stride=(1, self.stride, self.stride),
                            bias=True, activation=self.activation,
                            name="conv1")(x, train=train)
        return ConvBlock3d(out_channels=self.out_channels,
                           kernel_size=(3, 1, 1), stride=(1, 1, 1),
                           padding=(2, 0, 0), dilation=(2, 1, 1),
                           bias=True, activation=self.final_activation,
                           name="conv2")(x, train=train)


class DilationBlock(nn.Module):
    """Three spatially-dilated (1,3,3) convs (reference
    propainter_rfc.py:324)."""

    channels: int = 128
    activation: Any = lambda_leakyrelu(0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, d in enumerate((3, 2, 1)):
            x = conv1x3x3_block(out_channels=self.channels,
                                padding=(0, d, d), dilation=(1, d, d),
                                bias=True, activation=self.activation,
                                name=f"conv{i + 1}")(x, train=train)
        return x


class RFCDecoderUnit(nn.Module):
    """conv + 2x up + conv (reference propainter_rfc.py:370); operates on
    (B*T, H, W, C)."""

    out_channels: int = 0
    activation: Any = lambda_leakyrelu(0.2)
    final_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv3x3_block(out_channels=in_channels, bias=True,
                          normalization=None, activation=self.activation,
                          name="conv1")(x, train=train)
        x = InterpolationBlock(scale_factor=2)(x)
        return conv3x3_block(out_channels=self.out_channels, bias=True,
                             normalization=None,
                             activation=self.final_activation,
                             name="conv2")(x, train=train)


class EdgeDetection(nn.Module):
    """proj conv + res unit + 1x1 + sigmoid (reference
    propainter_rfc.py:423)."""

    out_channels: int = 1
    mid_channels: int = 16
    activation: Any = lambda_leakyrelu(0.2)
    final_activation: Any = lambda_leakyrelu(0.01)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, activation=self.activation,
                          name="proj")(x, train=train)
        x = ResUnit(out_channels=self.mid_channels, bias=True,
                    normalization=None, bottleneck=False,
                    activation=self.activation,
                    final_activation=self.final_activation,
                    name="res_unit")(x, train=train)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="out_conv")(x)
        return jax.nn.sigmoid(x)


class EncoderUnit(nn.Module):
    """Two P3D blocks, second strided (reference propainter_rfc.py:478)."""

    out_channels: int = 0
    activation: Any = lambda_leakyrelu(0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = P3dBlock(out_channels=in_channels, stride=1,
                     activation=self.activation,
                     final_activation=self.activation, name="block1")(
                         x, train=train)
        return P3dBlock(out_channels=self.out_channels, stride=2,
                        activation=self.activation,
                        final_activation=self.activation, name="block2")(
                            x, train=train)


class InitBlock(nn.Module):
    """(1,5,5)/2 replicate-padded conv (reference propainter_rfc.py:516).
    (B, T, H, W, C) in -> (B, T, H/2, W/2, 32) out."""

    out_channels: int = 32
    activation: Any = lambda_leakyrelu(0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBlock3d(out_channels=self.out_channels,
                           kernel_size=(1, 5, 5), stride=(1, 2, 2),
                           padding=(0, 2, 2), bias=True,
                           padding_mode="replicate",
                           activation=self.activation, name="conv")(
                               x, train=train)


class MainUnit(nn.Module):
    """Dilation stack + bidirectional propagation; flattens time into
    batch for the decoder (reference propainter_rfc.py:550)."""

    channels: int = 128
    activation: Any = lambda_leakyrelu(0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DilationBlock(channels=self.channels,
                          activation=self.activation,
                          name="mid_dilation")(x, train=train)
        x = RFCBidirectionalPropagation(channels=self.channels,
                                        name="feat_prop_module")(
                                            x, train=train)
        b, t, h, w, c = x.shape
        return x.reshape(b * t, h, w, c)


class ReshapeBlock(nn.Module):
    """(B, T, H, W, C) -> (B*T, H, W, C) skip reshape (reference
    propainter_rfc.py:588)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        return x.reshape(b * t, h, w, c)


class PPRecurrentFlowComplete(nn.Module):
    """ProPainter RFC (reference propainter_rfc.py:607).

    ``__call__(masked_flows (B,T,H,W,2), masks (B,T,H,W,1))`` ->
    (completed flow (B,T,H,W,2), edge map or None)."""

    calc_edge: bool = False
    in_channels: int = 3
    in_size: Tuple[int, int] = (240, 432)

    def dummy_inputs(self, batch: int = 1):
        h, w = self.in_size
        return (jnp.zeros((batch, 3, h, w, 2), jnp.float32),
                jnp.zeros((batch, 3, h, w, 1), jnp.float32))

    @nn.compact
    def __call__(self, masked_flows, masks, train: bool = False):
        b, t, h, w, c = masked_flows.shape
        assert c == 2 and h % 8 == 0 and w % 8 == 0
        act = lambda_leakyrelu(0.2)
        x = jnp.concatenate([masked_flows, masks], axis=-1)
        down_seq = (
            InitBlock(out_channels=32, activation=act, name="down1",
                      parent=None),
            EncoderUnit(out_channels=64, activation=act, name="down2",
                        parent=None),
            EncoderUnit(out_channels=128, activation=act, name="down3",
                        parent=None),
        )
        up_seq = (
            RFCDecoderUnit(out_channels=2, activation=act,
                           final_activation=None, name="up1", parent=None),
            RFCDecoderUnit(out_channels=32, activation=act,
                           final_activation=act, name="up2", parent=None),
            RFCDecoderUnit(out_channels=64, activation=act,
                           final_activation=act, name="up3", parent=None),
        )
        skip_seq = (
            BreakBlock(),
            BreakBlock(),
            ReshapeBlock(name="skip3", parent=None),
            MainUnit(channels=128, activation=act, name="skip4",
                     parent=None),
        )
        flow = Hourglass(down_seq=down_seq, up_seq=up_seq,
                         skip_seq=skip_seq, merge_type="add", name="hg")(
                             x, train=train)
        # the reference builds the edge detector unconditionally
        # (its params are in every checkpoint); materialize it always,
        # return its output only when requested
        edge = EdgeDetection(out_channels=1, mid_channels=16,
                             activation=act,
                             final_activation=lambda_leakyrelu(0.01),
                             name="edgeDetector")(flow, train=train)
        edge = edge.reshape(b, t, h, w, 1) if self.calc_edge else None
        flow = flow.reshape(b, t, h, w, 2)
        return flow, edge


def get_propainter_rfc(**kwargs) -> PPRecurrentFlowComplete:
    """Config expander (reference propainter_rfc.py:772)."""
    return PPRecurrentFlowComplete(**kwargs)


@register_model("propainter_rfc")
def propainter_rfc(**kwargs):
    return get_propainter_rfc(**kwargs)


def calc_bidirectional_opt_flow_completion_by_pprfc(
        apply_fn, flows, flow_masks, combine_flows: bool = True):
    """Complete bidirectional flow over a clip (reference
    propainter_rfc.py:720). ``flows``: (T, H, W, 4) (fwd, bwd);
    ``flow_masks``: (T, H, W, 2). Returns (comp_flows (T,H,W,4), edges)."""
    flows_forward, flows_backward = flows[..., :2], flows[..., 2:]
    masks_forward = flow_masks[..., :1]
    masks_backward = flow_masks[..., 1:]
    masked_f = flows_forward * (1 - masks_forward)
    masked_b = flows_backward * (1 - masks_backward)
    comp_f, edges_f = apply_fn(masked_f[None], masks_forward[None])
    comp_f = comp_f[0]
    masked_b_inv = masked_b[::-1]
    masks_b_inv = masks_backward[::-1]
    comp_b_inv, edges_b_inv = apply_fn(masked_b_inv[None],
                                       masks_b_inv[None])
    comp_b = comp_b_inv[0][::-1]
    if combine_flows:
        comp_f = comp_f * masks_forward + masked_f
        comp_b = comp_b * masks_backward + masked_b
    comp_flows = jnp.concatenate([comp_f, comp_b], axis=-1)
    edges = None
    if edges_f is not None:
        edges = jnp.concatenate([edges_f[0], edges_b_inv[0][::-1]],
                                axis=-1)
    return comp_flows, edges
