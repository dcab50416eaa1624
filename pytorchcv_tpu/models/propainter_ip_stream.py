"""Streaming ProPainter-IP: windowed image propagation (behavioral
reference: pytorchcv ``models/propainter_ip_stream.py``
ProPainterIPSequencer:14)."""

from __future__ import annotations

import jax.numpy as jnp

from ..streaming import WindowBufferedSequencer, \
    calc_serial_window_sequencer_index, concat_window_sequencer_indices
from .raft_stream import _resolve_apply

__all__ = ["ProPainterIPSequencer"]


class ProPainterIPSequencer(WindowBufferedSequencer):
    """Image-propagation window-buffered sequencer (reference
    propainter_ip_stream.py:14). Sources: frames (T,H,W,3), masks
    (T,H,W,1), comp_flows (T-1,H,W,4); produces frame+mask stacks
    (T, H, W, 4)."""

    def __init__(self, frames, masks, comp_flows, window_size: int = 80,
                 padding: int = 10, **kwargs):
        assert len(frames) > 0
        super().__init__(
            data=[frames, masks, comp_flows],
            window_index=self._calc_window_index(
                video_length=len(masks), window_size=window_size,
                padding=padding),
            **kwargs)
        self.net = _resolve_apply(None, "propainter_ip")

    def _calc_data_items(self, raw_data_chunk_list):
        assert len(raw_data_chunk_list) == 3
        frames, masks, comp_flows = raw_data_chunk_list
        prop_frames, updated_masks = self.net(
            frames, masks, comp_flows, interpolation="nearest")
        return jnp.concatenate([prop_frames, updated_masks], axis=-1)

    @staticmethod
    def _calc_window_index(video_length, window_size, padding):
        assert window_size > 0
        images_index = calc_serial_window_sequencer_index(
            length=video_length, target_length=video_length,
            window_size=window_size, padding=(padding, padding),
            edge_mode="ignore")
        flows_index = calc_serial_window_sequencer_index(
            length=video_length - 1, target_length=video_length,
            window_size=window_size, padding=(padding, padding - 1),
            edge_mode="ignore")
        return concat_window_sequencer_indices(
            [images_index, images_index, flows_index])
