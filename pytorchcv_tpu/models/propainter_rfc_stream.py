"""Streaming ProPainter-RFC: windowed flow completion (behavioral
reference: pytorchcv ``models/propainter_rfc_stream.py``
ProPainterRFCSequencer:15)."""

from __future__ import annotations

import jax.numpy as jnp

from ..streaming import WindowBufferedSequencer, \
    calc_serial_window_sequencer_index, concat_window_sequencer_indices
from .propainter_rfc import calc_bidirectional_opt_flow_completion_by_pprfc
from .raft_stream import _resolve_apply

__all__ = ["ProPainterRFCSequencer"]


class ProPainterRFCSequencer(WindowBufferedSequencer):
    """Flow-completion window-buffered sequencer (reference
    propainter_rfc_stream.py:15). Sources: flows (T-1, H, W, 4) + masks
    (T, H, W, 1); produces completed flows (T-1, H, W, 4)."""

    def __init__(self, flows, masks, pprfc_model=None,
                 window_size: int = 80, padding: int = 5, **kwargs):
        assert len(masks) > 0
        super().__init__(
            data=[flows, masks],
            window_index=self._calc_window_index(
                video_length=len(masks), window_size=window_size,
                padding=padding),
            **kwargs)
        self.net = _resolve_apply(pprfc_model, "propainter_rfc")

    def _calc_data_items(self, raw_data_chunk_list):
        assert len(raw_data_chunk_list) == 2
        flows, masks = raw_data_chunk_list
        flow_masks = jnp.concatenate([masks[:-1], masks[1:]], axis=-1)
        comp_flows, _ = calc_bidirectional_opt_flow_completion_by_pprfc(
            self.net, flows, flow_masks)
        return comp_flows

    @staticmethod
    def _calc_window_index(video_length, window_size, padding):
        assert window_size > 0
        flows_index = calc_serial_window_sequencer_index(
            length=video_length - 1, target_length=video_length,
            window_size=window_size, padding=(padding, padding),
            edge_mode="ignore")
        mask_index = calc_serial_window_sequencer_index(
            length=video_length, target_length=video_length,
            window_size=window_size, padding=(padding, padding + 1),
            edge_mode="ignore")
        return concat_window_sequencer_indices([flows_index, mask_index])
