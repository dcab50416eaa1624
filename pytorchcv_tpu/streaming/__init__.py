"""Streaming engine: lazy windowed evaluation over unbounded sequences
(analog of reference ``common/stream.py``)."""

from .engine import (BufferedSequencer, Sequencer, TensorSequencer,
                     WindowBufferedSequencer, WindowMap, WindowMultiMap,
                     WindowRange, calc_serial_window_sequencer_index,
                     calc_sliding_window_sequencer_index,
                     concat_window_sequencer_indices)
