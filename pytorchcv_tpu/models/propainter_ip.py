"""ProPainter Image Propagation, TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/propainter_ip.py`` (flow_warp:18,
fb_consistency_check:73, BidirectionalPropagation:103,
PPImagePropagation:287, get_propainter_ip:352) from 'ProPainter'
https://arxiv.org/pdf/2309.03897.

``PPImagePropagation`` is PARAMETERLESS (reference weight_count == 0):
pure flow-warping + consistency-gated blending. The learnable
``BidirectionalPropagation`` (deformable alignment + fuse ResBlock) is the
variant embedded in the main ProPainter generator."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import grid_sample, lambda_leakyrelu
from ..nn.arch import IndexedSeq
from .propainter_rfc import SecondOrderDeformableAlignment
from .registry import register_model
from .resnet import ResBlock

__all__ = ["PPImagePropagation", "BidirectionalPropagation", "flow_warp",
           "fb_consistency_check", "get_propainter_ip"]


def flow_warp(x, flow, interpolation: str = "bilinear",
              align_corners: bool = True):
    """Warp (B, H, W, C) by pixel-offset flow (B, H, W, 2)=(dx, dy)
    (reference propainter_ip.py:18)."""
    b, h, w, _ = x.shape
    # f32 coordinates: bf16 pixel positions are ~2 px coarse at x~430.
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fx = gx[None] + flow[..., 0].astype(jnp.float32)
    fy = gy[None] + flow[..., 1].astype(jnp.float32)
    grid = jnp.stack([2.0 * fx / max(w - 1, 1) - 1.0,
                      2.0 * fy / max(h - 1, 1) - 1.0], axis=-1)
    return grid_sample(x, grid, mode=interpolation,
                       align_corners=align_corners)


def length_sq(x):
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def fb_consistency_check(flow_fw, flow_bw, alpha1: float = 0.01,
                         alpha2: float = 0.5):
    """Forward-backward flow consistency mask (reference
    propainter_ip.py:73). Flows are (B, H, W, 2)."""
    flow_bw_warped = flow_warp(flow_bw, flow_fw)
    flow_diff_fw = flow_fw + flow_bw_warped
    mag_sq_fw = length_sq(flow_fw) + length_sq(flow_bw_warped)
    occ_thresh_fw = alpha1 * mag_sq_fw + alpha2
    return (length_sq(flow_diff_fw) < occ_thresh_fw).astype(flow_fw.dtype)


def _binary_mask(mask, th: float = 0.1):
    return (mask > th).astype(mask.dtype)


class BidirectionalPropagation(nn.Module):
    """Flow-guided bidirectional propagation (reference
    propainter_ip.py:103). Tensors are (B, T, H, W, C); flows
    (B, T-1, H, W, 2) with (dx, dy) channels."""

    channels: int = 3
    learnable: bool = True

    @nn.compact
    def __call__(self, x, flows_forward, flows_backward, mask,
                 interpolation: str = "bilinear", train: bool = False):
        b, t, h, w, c = x.shape
        assert c == self.channels
        act = lambda_leakyrelu(0.2)
        prop_list = ["backward_1", "forward_1"]
        if self.learnable:
            align_seq = IndexedSeq(layers=tuple(
                SecondOrderDeformableAlignment(
                    out_channels=c, deform_groups=16,
                    max_residue_magnitude=3, name=m, parent=None)
                for m in prop_list), name="deform_align")
            backbone_seq = IndexedSeq(layers=tuple(
                ResBlock(out_channels=c, stride=1, bias=True,
                         normalization=None, activation=act, name=m,
                         parent=None) for m in prop_list), name="backbone")
            fuse = ResBlock(out_channels=c, stride=1, bias=True,
                            normalization=None, activation=act,
                            name="fuse")

        feats = {"input": [x[:, i] for i in range(t)]}
        masks = {"input": [mask[:, i] for i in range(t)]}
        cache_list = ["input"] + prop_list
        for p_i, module_name in enumerate(prop_list):
            feats[module_name] = []
            masks[module_name] = []
            if "backward" in module_name:
                frame_idx = list(range(t))[::-1]
                flow_idx = frame_idx
                flows_for_prop = flows_forward
                flows_for_check = flows_backward
            else:
                frame_idx = list(range(t))
                flow_idx = list(range(-1, t - 1))
                flows_for_prop = flows_backward
                flows_for_check = flows_forward
            for i, idx in enumerate(frame_idx):
                feat_current = feats[cache_list[p_i]][idx]
                mask_current = masks[cache_list[p_i]][idx]
                if i == 0:
                    feat_prop = feat_current
                    mask_prop = mask_current
                else:
                    flow_prop = flows_for_prop[:, flow_idx[i]]
                    flow_check = flows_for_check[:, flow_idx[i]]
                    flow_valid_mask = fb_consistency_check(flow_prop,
                                                           flow_check)
                    feat_warped = flow_warp(feat_prop, flow_prop,
                                            interpolation)
                    if self.learnable:
                        cond = jnp.concatenate(
                            [feat_current, feat_warped, flow_prop,
                             flow_valid_mask, mask_current], axis=-1)
                        feat_prop = align_seq(feat_prop, p_i, cond=cond,
                                              flow=flow_prop, train=train)
                        mask_prop = mask_current
                    else:
                        mask_prop_valid = flow_warp(mask_prop, flow_prop)
                        mask_prop_valid = _binary_mask(mask_prop_valid)
                        union_valid_mask = _binary_mask(
                            mask_current * flow_valid_mask *
                            (1 - mask_prop_valid))
                        feat_prop = union_valid_mask * feat_warped + \
                            (1 - union_valid_mask) * feat_current
                        mask_prop = _binary_mask(
                            mask_current *
                            (1 - (flow_valid_mask *
                                  (1 - mask_prop_valid))))
                if self.learnable:
                    feat = jnp.concatenate(
                        [feat_current, feat_prop, mask_current], axis=-1)
                    feat_prop = feat_prop + backbone_seq(feat, p_i,
                                                         train=train)
                feats[module_name].append(feat_prop)
                masks[module_name].append(mask_prop)
            if "backward" in module_name:
                feats[module_name] = feats[module_name][::-1]
                masks[module_name] = masks[module_name][::-1]

        outputs_b = jnp.stack(feats["backward_1"], axis=1)
        outputs_f = jnp.stack(feats["forward_1"], axis=1)
        if self.learnable:
            masks_f = None
            fused_in = jnp.concatenate(
                [outputs_b.reshape(b * t, h, w, c),
                 outputs_f.reshape(b * t, h, w, c),
                 mask.reshape(b * t, h, w, -1)], axis=-1)
            outputs = fuse(fused_in, train=train) + \
                x.reshape(b * t, h, w, c)
            outputs = outputs.reshape(b, t, h, w, c)
        else:
            masks_f = jnp.stack(masks["forward_1"], axis=1)
            outputs = outputs_f
        return outputs_b, outputs_f, outputs, masks_f


class PPImagePropagation(nn.Module):
    """Parameterless image propagation (reference propainter_ip.py:287).

    ``__call__(frames (T,H,W,3), masks (T,H,W,1),
    comp_flows (T-1,H,W,4))`` -> (prop_frames (T,H,W,3),
    updated_masks (T,H,W,1))."""

    in_channels: int = 3
    in_size: Tuple[int, int] = (240, 432)

    def dummy_inputs(self, batch: int = 1):
        del batch
        h, w = self.in_size
        return (jnp.zeros((3, h, w, 3), jnp.float32),
                jnp.zeros((3, h, w, 1), jnp.float32),
                jnp.zeros((2, h, w, 4), jnp.float32))

    @nn.compact
    def __call__(self, frames, masks, comp_flows,
                 interpolation: str = "nearest", train: bool = False):
        assert frames.ndim == 4 and comp_flows.shape[-1] == 4
        masked_frames = frames * (1 - masks)
        flows_fwd, flows_bwd = comp_flows[..., :2], comp_flows[..., 2:]
        _, _, prop_frames, updated_masks = BidirectionalPropagation(
            channels=self.in_channels, learnable=False, name="prop")(
                masked_frames[None], flows_fwd[None], flows_bwd[None],
                masks[None], interpolation=interpolation, train=train)
        return prop_frames[0], updated_masks[0]


def get_propainter_ip(**kwargs) -> PPImagePropagation:
    """Config expander (reference propainter_ip.py:352)."""
    return PPImagePropagation(**kwargs)


@register_model("propainter_ip")
def propainter_ip(**kwargs):
    return get_propainter_ip(**kwargs)
