"""Pure-torch reimplementation of torchvision.ops.deform_conv2d (modulated,
weight-groups=1), used two ways:

1. numeric oracle for pytorchcv_tpu.nn.deform.deform_conv2d;
2. an importable ``torchvision`` stub so the reference ProPainter models
   (which import torchvision.ops.DeformConv2d) can be instantiated for
   parity testing in this torchvision-less environment.

Semantics follow torchvision's C++ kernel: offset channels are
(group-major, tap-major, (y, x) interleaved); mask channels
(group-major, tap-major); out-of-image bilinear samples are zero.
"""

import math
import sys
import types

import torch
import torch.nn as nn


def deform_conv2d_ref(x, offset, mask, weight, bias=None, stride=1,
                      padding=1):
    b, c, hin, win = x.shape
    cout, cin, kh, kw = weight.shape
    k2 = kh * kw
    g = offset.shape[1] // (2 * k2)
    cg = c // g
    _, _, hout, wout = offset.shape

    off = offset.view(b, g, k2, 2, hout, wout)
    m = mask.view(b, g, k2, hout, wout)

    base_y = torch.arange(hout, dtype=x.dtype) * stride - padding
    base_x = torch.arange(wout, dtype=x.dtype) * stride - padding
    ky = torch.arange(kh).repeat_interleave(kw).to(x.dtype)
    kx = torch.arange(kw).repeat(kh).to(x.dtype)

    py = base_y.view(1, 1, 1, -1, 1) + ky.view(1, 1, -1, 1, 1) + \
        off[:, :, :, 0]
    px = base_x.view(1, 1, 1, 1, -1) + kx.view(1, 1, -1, 1, 1) + \
        off[:, :, :, 1]

    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy = py - y0
    wx = px - x0

    xg = x.view(b, g, cg, hin * win)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < hin) & (xi >= 0) & (xi < win)
        yc = yi.clamp(0, hin - 1).long()
        xc = xi.clamp(0, win - 1).long()
        flat = (yc * win + xc).view(b, g, 1, -1).expand(b, g, cg, -1)
        v = torch.gather(xg, 3, flat).view(b, g, cg, k2, hout, wout)
        return v * valid.view(b, g, 1, k2, hout, wout).to(x.dtype)

    v = (corner(y0, x0) * ((1 - wy) * (1 - wx)).unsqueeze(2) +
         corner(y0, x0 + 1) * ((1 - wy) * wx).unsqueeze(2) +
         corner(y0 + 1, x0) * (wy * (1 - wx)).unsqueeze(2) +
         corner(y0 + 1, x0 + 1) * (wy * wx).unsqueeze(2))
    v = v * m.unsqueeze(2)
    # (B, C, K2, Ho, Wo) -> contraction with weight (O, C, K2)
    v = v.reshape(b, c, k2, hout, wout)
    w = weight.view(cout, cin, k2)
    out = torch.einsum("bckhw,ock->bohw", v, w)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class DeformConv2d(nn.Module):
    """Drop-in for torchvision.ops.DeformConv2d (stride/padding ints,
    dilation 1, weight groups 1)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        assert dilation == 1 and groups == 1
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) \
            if isinstance(kernel_size, int) else kernel_size
        self.stride = stride
        self.padding = padding
        self.weight = nn.Parameter(torch.empty(
            out_channels, in_channels, *self.kernel_size))
        self.bias = nn.Parameter(torch.empty(out_channels)) if bias \
            else None
        n = in_channels * self.kernel_size[0] * self.kernel_size[1]
        stdv = 1.0 / math.sqrt(n)
        self.weight.data.uniform_(-stdv, stdv)
        if self.bias is not None:
            self.bias.data.zero_()

    def forward(self, input, offset, mask=None):
        return deform_conv2d_ref(input, offset, mask, self.weight,
                                 self.bias, stride=self.stride,
                                 padding=self.padding)


def install_torchvision_stub():
    """Register a minimal ``torchvision`` module exposing ops.DeformConv2d
    so the reference ProPainter files import cleanly."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.DeformConv2d = DeformConv2d
    ops.deform_conv2d = deform_conv2d_ref
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
