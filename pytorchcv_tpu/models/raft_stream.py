"""Streaming RAFT: windowed bidirectional optical flow over a video
sequence (behavioral reference: pytorchcv ``models/raft_stream.py``
RAFTSequencer:16)."""

from __future__ import annotations

from typing import Optional

from ..streaming import WindowBufferedSequencer, \
    calc_serial_window_sequencer_index
from .raft import calc_bidirectional_optical_flow_on_video_by_raft

__all__ = ["RAFTSequencer"]


def _resolve_apply(model, name, **kwargs):
    """Accept a Model handle, a bare apply callable, or None (build by
    registered name; pass pretrained=True when a checkpoint cache is
    available). Returns a uniform apply callable."""
    if model is None:
        from ..model_provider import get_model
        model = get_model(name, **kwargs)
    if hasattr(model, "module") and hasattr(model, "variables"):
        mdl = model
        return lambda *a, **kw: mdl.apply(mdl.variables or {}, *a, **kw)
    return model


class RAFTSequencer(WindowBufferedSequencer):
    """Optical-flow window-buffered sequencer (reference
    raft_stream.py:16). ``frames``: (T, H, W, 3) sequence; produces
    (T-1, H, W, 4) bidirectional flow."""

    def __init__(self, frames, raft_model=None, raft_iters: int = 20,
                 window_size: Optional[int] = None, **kwargs):
        assert len(frames) > 1
        super().__init__(
            data=frames,
            window_index=self._calc_window_index(
                video_length=len(frames),
                window_size=window_size,
                frame_size=frames[0].shape[:2]),
            **kwargs)
        self.net = _resolve_apply(raft_model, "raft_things",
                                  in_normalize=False, iters=raft_iters)

    def _calc_data_items(self, raw_data_chunk_list):
        assert len(raw_data_chunk_list) == 1
        frames = raw_data_chunk_list[0]
        return calc_bidirectional_optical_flow_on_video_by_raft(
            self.net, frames)

    @staticmethod
    def _calc_window_index(video_length, window_size, frame_size):
        return calc_serial_window_sequencer_index(
            length=video_length, target_length=video_length,
            window_size=RAFTSequencer._calc_window_size(window_size,
                                                        frame_size),
            padding=(1, 0), edge_mode="trim")

    @staticmethod
    def _calc_window_size(window_size, frame_size):
        """Heuristic window size vs frame resolution (reference
        raft_stream.py:180)."""
        if window_size is not None:
            assert window_size > 0
            return window_size
        m = max(frame_size[0], frame_size[1])
        if m <= 640:
            return 12
        if m <= 720:
            return 8
        if m <= 1280:
            return 4
        if m <= 1980:
            return 2
        return 1
