"""Streaming ProPainter: the full video-inpainting pipeline as lazily
evaluated, windowed sequencers (behavioral reference: pytorchcv
``models/propainter_stream.py`` ProPainterITSequencer:20,
ProPainterIMSequencer:290, ProPainterIterator:336, TensorSequencer:462).

The five-stage pipeline — RAFT flow -> RFC completion -> image propagation
-> sparse-transformer synthesis -> mask blend — advances in fixed windows;
each stage's buffer is trimmed as the consumer passes, bounding HBM to a
handful of windows regardless of video length."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..streaming import (BufferedSequencer, Sequencer, TensorSequencer,
                         WindowBufferedSequencer,
                         calc_sliding_window_sequencer_index,
                         concat_window_sequencer_indices)
from .propainter_ip_stream import ProPainterIPSequencer
from .propainter_rfc_stream import ProPainterRFCSequencer
from .raft_stream import RAFTSequencer, _resolve_apply

__all__ = ["ProPainterITSequencer", "ProPainterIMSequencer",
           "ProPainterIterator", "TensorSequencer"]


class ProPainterITSequencer(WindowBufferedSequencer):
    """Image-transform (sparse-transformer generator) sequencer with
    stride-5 sliding windows and overlap-averaged outputs (reference
    propainter_stream.py:20)."""

    def __init__(self, prop_framemasks, masks, comp_flows, pp_model=None,
                 pp_stride: int = 5, pp_ref_stride: int = 10,
                 pp_ref_window_size: int = 80, **kwargs):
        assert len(masks) > 0
        super().__init__(
            data=[prop_framemasks, masks, comp_flows],
            window_index=self._calc_window_index(
                video_length=len(masks), pp_stride=pp_stride,
                pp_ref_window_size=pp_ref_window_size),
            **kwargs)
        self.net = _resolve_apply(pp_model, "propainter")
        self.stride = pp_stride
        self.ref_stride = pp_ref_stride
        self.num_refs = pp_ref_window_size // pp_ref_stride

    def _calc_data_items(self, raw_data_chunk_list):
        assert len(raw_data_chunk_list) == 3
        prop_framemasks, masks, comp_flows = raw_data_chunk_list
        prop_frames = prop_framemasks[..., :3]
        updated_masks = prop_framemasks[..., 3:]
        win_pos = self.window_pos + 1
        s_idx = win_pos * self.stride
        neighbor_ids = self._calc_neighbor_index(s_idx, self.length,
                                                 self.stride)
        ref_ids = self._calc_ref_index(s_idx, neighbor_ids, self.length,
                                       self.ref_stride, self.num_refs)
        wmm = self.window_index[win_pos]
        # np index array works for both np (host_buffers) and jnp chunks
        import numpy as _np
        ids = _np.asarray([i - wmm.sources[0].start
                           for i in neighbor_ids + ref_ids])
        masked_frames = prop_frames[ids][None]
        masks_updated = updated_masks[ids][None]
        masks_in = masks[ids][None]
        completed_flows = comp_flows[None]
        l_t = len(comp_flows) + 1
        trans_frames = self.net(masked_frames, masks_updated, masks_in,
                                completed_flows, l_t)
        return trans_frames[0]

    def _calc_window_pose(self, pos: int) -> int:
        # windows OVERLAP here: advance only when pos passes a window's
        # target START (reference propainter_stream.py:118)
        for win_pos in range(max(self.window_pos + 1, 0),
                             self.window_length):
            if pos <= self.window_index[win_pos].target.start:
                assert win_pos > 0
                return win_pos - 1
        return self.window_length - 1

    def _expand_buffer_by(self, data_chunk):
        # overlap-average with the existing buffer tail
        wmm = self.window_index[self.window_pos + 1]
        assert wmm.target_start == 0
        s = wmm.target.start - self.start_pos
        assert 0 <= s <= len(self.buffer)
        if s == len(self.buffer):
            self.buffer = self._concat([self.buffer, data_chunk])
        else:
            tail_len = len(self.buffer) - s
            assert tail_len <= len(data_chunk)
            blended = 0.5 * (self.buffer[s:] + data_chunk[:tail_len])
            self.buffer = self._concat(
                [self.buffer[:s], blended, data_chunk[tail_len:]])

    @staticmethod
    def _calc_neighbor_index(mid, length, stride):
        return list(range(max(0, mid - stride),
                          min(length, mid + stride + 1)))

    @staticmethod
    def _calc_ref_index(mid, neighbor_ids, length, ref_stride, ref_num):
        ref_index = []
        if ref_num == -1:
            for i in range(0, length, ref_stride):
                if i not in neighbor_ids:
                    ref_index.append(i)
        else:
            start = max(0, mid - ref_stride * (ref_num // 2))
            end = min(length, mid + ref_stride * (ref_num // 2))
            for i in range(start, end, ref_stride):
                if i not in neighbor_ids:
                    if len(ref_index) > ref_num:
                        break
                    ref_index.append(i)
        return ref_index

    @staticmethod
    def _calc_window_index(video_length, pp_stride, pp_ref_window_size):
        assert pp_ref_window_size % 2 == 0
        ref_index = calc_sliding_window_sequencer_index(
            length=video_length, stride=pp_stride,
            src_padding=(pp_ref_window_size // 2,
                         pp_ref_window_size // 2 + 1),
            padding=(pp_stride, pp_stride + 1))
        flows_index = calc_sliding_window_sequencer_index(
            length=video_length, stride=pp_stride,
            src_padding=(pp_stride, pp_stride),
            padding=(pp_stride, pp_stride + 1))
        return concat_window_sequencer_indices(
            [ref_index, ref_index, flows_index])


class ProPainterIMSequencer(Sequencer):
    """Final inpaint blend: trans*mask + frame*(1-mask) (reference
    propainter_stream.py:290)."""

    def __init__(self, trans_frames, frames, masks):
        assert len(frames) > 0
        super().__init__(data=[trans_frames, frames, masks])

    def _calc_data_items(self, raw_data_chunk_list):
        assert len(raw_data_chunk_list) == 3
        trans_frames, frames, masks = raw_data_chunk_list
        return trans_frames * masks + frames * (1 - masks)


class ProPainterIterator:
    """End-to-end streaming video inpainting (reference
    propainter_stream.py:336): iterate to receive inpainted frame chunks
    of size ``step`` while all stage buffers stay trimmed."""

    def __init__(self, frames: BufferedSequencer,
                 masks: BufferedSequencer, raft_model=None,
                 pprfc_model=None, pp_model=None,
                 raft_window_size: Optional[int] = None,
                 pp_window_size: int = 80, pp_stride: int = 5,
                 step: int = 10, host_buffers: bool = False):
        assert len(frames) > 0 and len(frames) == len(masks) and step > 0
        assert isinstance(frames, BufferedSequencer)
        assert isinstance(masks, BufferedSequencer)
        self.video_length = len(frames)
        self.step = step
        self.frames = frames
        self.masks = masks
        if host_buffers:
            frames.enable_host_buffers()
            masks.enable_host_buffers()
        self.flow_sequencer = RAFTSequencer(
            frames=frames, raft_model=raft_model,
            window_size=raft_window_size, host_buffers=host_buffers)
        self.comp_flow_sequencer = ProPainterRFCSequencer(
            flows=self.flow_sequencer, masks=masks,
            pprfc_model=pprfc_model, window_size=pp_window_size,
            host_buffers=host_buffers)
        self.prop_framemask_sequencer = ProPainterIPSequencer(
            frames=frames, masks=masks,
            comp_flows=self.comp_flow_sequencer,
            window_size=pp_window_size, host_buffers=host_buffers)
        self.trans_frame_sequencer = ProPainterITSequencer(
            prop_framemasks=self.prop_framemask_sequencer, masks=masks,
            comp_flows=self.comp_flow_sequencer, pp_model=pp_model,
            pp_ref_window_size=pp_window_size,
            host_buffers=host_buffers)
        self.inp_frame_sequencer = ProPainterIMSequencer(
            trans_frames=self.trans_frame_sequencer, frames=frames,
            masks=masks)
        self.main_sequencer = self.inp_frame_sequencer
        self.trans_frame_trim_pad = 2
        self.prop_framemask_trim_pad = pp_window_size // 2 - pp_stride
        self.comp_flow_trim_pad = 2
        self.flow_trim_pad = 2
        self.mask_trim_pad = pp_window_size // 2 - pp_stride
        self.frame_trim_pad = 2

    def __iter__(self):
        self.s = -self.step
        self.trans_frame_sequencer.clear_buffer()
        self.prop_framemask_sequencer.clear_buffer()
        self.comp_flow_sequencer.clear_buffer()
        self.flow_sequencer.clear_buffer()
        self.masks.clear_buffer()
        self.frames.clear_buffer()
        return self

    def __next__(self):
        if self.s is None:
            raise StopIteration
        self.s = min(self.s + self.step, self.video_length - 1)
        e = min(self.s + self.step, self.video_length)
        data = self.main_sequencer[self.s:e]
        self.trans_frame_sequencer.trim_buffer_to(
            max(e - self.trans_frame_trim_pad, 0))
        self.prop_framemask_sequencer.trim_buffer_to(
            max(e - self.prop_framemask_trim_pad, 0))
        self.comp_flow_sequencer.trim_buffer_to(
            max(e - self.comp_flow_trim_pad, 0))
        self.flow_sequencer.trim_buffer_to(max(e - self.flow_trim_pad, 0))
        self.masks.trim_buffer_to(max(e - self.mask_trim_pad, 0))
        self.frames.trim_buffer_to(max(e - self.frame_trim_pad, 0))
        if e == self.video_length:
            self.s = None
        return data
