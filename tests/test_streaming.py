"""Streaming engine tier: window-index calculators match the reference's
bit-for-bit; buffered sequencers grow/trim correctly; and the five-stage
ProPainter video-inpainting iterator runs end-to-end.

The full numeric end-to-end against the reference pipeline (RAFT -> RFC ->
IP -> transformer -> blend over a 12-frame 128px clip, rel err ~1e-9) takes
~6 min on this 1-CPU box; it runs with STREAM_E2E=1."""

import os

import numpy as np
import pytest

from conftest import (add_reference_to_path, has_reference,
                      randomize_stateful_tensors)


def test_window_index_parity_with_reference():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    add_reference_to_path()
    from pytorchcv.models.common import stream as ref_stream
    from pytorchcv_tpu.streaming import engine as my_stream

    for L, tl, ws, pad, em in [(20, None, 5, (1, 0), "trim"),
                               (19, 20, 80, (5, 5), "ignore"),
                               (140, 140, 12, (1, 0), "trim"),
                               (139, 140, 80, (5, 6), "ignore")]:
        a = ref_stream.calc_serial_window_sequencer_index(L, tl, ws, pad,
                                                          em)
        b = my_stream.calc_serial_window_sequencer_index(L, tl, ws, pad,
                                                         em)
        assert [repr(x) for x in a] == [repr(x) for x in b]
    for L, st, sp, pd in [(20, 5, (40, 41), (5, 6)),
                          (140, 5, (40, 41), (5, 6)),
                          (20, 5, (5, 5), (5, 6))]:
        a = ref_stream.calc_sliding_window_sequencer_index(L, st, sp, pd)
        b = my_stream.calc_sliding_window_sequencer_index(L, st, sp, pd)
        assert [repr(x) for x in a] == [repr(x) for x in b]


def test_buffered_sequencer_grow_trim():
    import jax.numpy as jnp
    from pytorchcv_tpu.streaming import TensorSequencer

    data = jnp.arange(20.0).reshape(20, 1)
    seq = TensorSequencer(data)
    assert np.allclose(np.asarray(seq[0:5]), np.asarray(data[0:5]))
    assert seq.end_pos == 5
    assert np.allclose(np.asarray(seq[3:8]), np.asarray(data[3:8]))
    seq.trim_buffer_to(6)
    assert np.allclose(np.asarray(seq[6:10]), np.asarray(data[6:10]))
    seq.clear_buffer()
    assert np.allclose(np.asarray(seq[0:3]), np.asarray(data[0:3]))


def test_window_buffered_sequencer_windows():
    import jax.numpy as jnp
    from pytorchcv_tpu.streaming import (WindowBufferedSequencer,
                                         calc_serial_window_sequencer_index)

    calls = []

    class Doubler(WindowBufferedSequencer):
        def _calc_data_items(self, chunks):
            calls.append(len(chunks[0]))
            return 2 * chunks[0]

    data = jnp.arange(17.0).reshape(17, 1)
    idx = calc_serial_window_sequencer_index(17, 17, window_size=5,
                                             padding=(1, 0),
                                             edge_mode="trim")
    seq = Doubler(window_index=idx, data=data)
    out = np.asarray(seq[0:16])
    assert np.allclose(out, 2 * np.arange(16).reshape(16, 1))
    assert len(calls) >= 3  # lazily evaluated per window


def test_window_batch_sharded_bitwise_equal():
    """Temporal multi-chip: same-shaped windows evaluated as one batch
    sharded over the mesh 'data' axis must be BITWISE identical to the
    serial path (the halo is carried by the overlapping source slices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from pytorchcv_tpu.streaming import (WindowBufferedSequencer,
                                         calc_serial_window_sequencer_index)

    batched_calls = []

    class Blur(WindowBufferedSequencer):
        def _calc_data_items(self, chunks):
            x = chunks[0]
            return x * 1.7 + jnp.cumsum(x, axis=0)

        def _calc_data_items_batched(self, stacked):
            batched_calls.append(stacked[0].shape)
            return super()._calc_data_items_batched(stacked)

    data = jnp.arange(53.0).reshape(53, 1) * 0.37
    idx = calc_serial_window_sequencer_index(53, 53, window_size=5,
                                             padding=(1, 1),
                                             edge_mode="trim")
    serial = Blur(window_index=idx, data=data)
    want = np.asarray(serial[0:53])

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    sharded = Blur(window_index=idx, data=data, mesh=mesh)
    got = np.asarray(sharded[0:53])
    assert batched_calls, "sharded path never took the window-batch route"
    np.testing.assert_array_equal(got, want)


def test_raft_sequencer_sharded_matches_serial():
    """RAFT streaming flow: window-batch over the mesh == serial, bitwise."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.raft_stream import RAFTSequencer

    frames = jnp.asarray(
        np.random.RandomState(0).rand(9, 64, 64, 3).astype(np.float32))
    model = ptc.get_model("raft_small", in_size=(64, 64), iters=2,
                          in_normalize=False)
    serial = RAFTSequencer(frames, raft_model=model, window_size=3)
    want = np.asarray(serial[0:8])

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",))
    sharded = RAFTSequencer(frames, raft_model=model, window_size=3,
                            mesh=mesh)
    got = np.asarray(sharded[0:8])
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_propainter_iterator_smoke():
    """Five-stage iterator with a fake flow model and random-init nets."""
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                        TensorSequencer)

    T, H, W = 8, 48, 96
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.rand(T, H, W, 3) * 255).astype(np.float32))
    masks = jnp.asarray((rs.rand(T, H, W, 1) > 0.8).astype(np.float32))

    def fake_raft(f1, f2):
        t = f1.shape[0]
        return (jnp.zeros((t, H // 8, W // 8, 2)),
                jnp.zeros((t, H, W, 2)))

    rfc = ptc.get_model("propainter_rfc", in_size=(H, W))
    pp = ptc.get_model("propainter", in_size=(H, W))
    it = ProPainterIterator(frames=TensorSequencer(frames),
                            masks=TensorSequencer(masks),
                            raft_model=fake_raft, pprfc_model=rfc,
                            pp_model=pp, step=5)
    outs = [np.asarray(c) for c in it]
    out = np.concatenate(outs, 0)
    assert out.shape == (T, H, W, 3)
    assert np.isfinite(out).all()
    # unmasked pixels pass straight through
    m = np.asarray(masks)
    f = np.asarray(frames)
    assert np.allclose(out * (1 - m), f * (1 - m), atol=1e-4)


def test_propainter_iterator_host_buffers_matches_device():
    """host_buffers=True (all bookkeeping in numpy, one fetch per window)
    must produce the same frames as the device-buffered path."""
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                        TensorSequencer)

    T, H, W = 8, 48, 96
    rs = np.random.RandomState(1)
    frames = (rs.rand(T, H, W, 3) * 255).astype(np.float32)
    masks = (rs.rand(T, H, W, 1) > 0.8).astype(np.float32)

    def fake_raft(f1, f2):
        t = f1.shape[0]
        return (jnp.zeros((t, H // 8, W // 8, 2)),
                jnp.zeros((t, H, W, 2)))

    rfc = ptc.get_model("propainter_rfc", in_size=(H, W))
    pp = ptc.get_model("propainter", in_size=(H, W))

    def run(host):
        it = ProPainterIterator(frames=TensorSequencer(jnp.asarray(frames)),
                                masks=TensorSequencer(jnp.asarray(masks)),
                                raft_model=fake_raft, pprfc_model=rfc,
                                pp_model=pp, step=5, host_buffers=host)
        return np.concatenate([np.asarray(c) for c in it], 0)

    dev = run(False)
    hst = run(True)
    assert hst.shape == dev.shape
    # identical programs, identical inputs; only the buffer domain moved
    np.testing.assert_allclose(hst, dev, atol=1e-5)


@pytest.mark.skipif(not os.environ.get("STREAM_E2E"),
                    reason="full numeric e2e only with STREAM_E2E=1")
def test_streaming_pipeline_full_numeric_parity():
    import dataclasses
    import torch

    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo.convert import convert_state_dict
    from tv_stub import install_torchvision_stub

    if not has_reference():
        pytest.skip("reference repo not mounted")
    install_torchvision_stub()
    add_reference_to_path()
    from pytorchcv.models import propainter as ref_pp_mod
    from pytorchcv.models import propainter_rfc as ref_rfc_mod
    from pytorchcv.models import raft as ref_raft_mod
    from pytorchcv.models.propainter_stream import (
        ProPainterIterator as RefIter, TensorSequencer as RefTenSeq)
    from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                        TensorSequencer)

    T, H, W = 12, 128, 128
    rs = np.random.RandomState(0)
    frames = (rs.rand(T, 3, H, W) * 255).astype(np.float32)
    masks = (rs.rand(T, 1, H, W) > 0.8).astype(np.float32)

    torch.manual_seed(0)
    raft_t = ref_raft_mod.raft_things(in_normalize=False, iters=20).eval()
    randomize_stateful_tensors(raft_t)
    with torch.no_grad():
        for v in raft_t.state_dict().values():
            if v.ndim >= 2:
                v.mul_(0.25)
    torch.manual_seed(0)
    rfc_t = ref_rfc_mod.propainter_rfc().eval()
    randomize_stateful_tensors(rfc_t)
    torch.manual_seed(0)
    pp_t = ref_pp_mod.propainter().eval()
    randomize_stateful_tensors(pp_t)

    ref_it = RefIter(frames=RefTenSeq(torch.from_numpy(frames)),
                     masks=RefTenSeq(torch.from_numpy(masks)),
                     raft_model=raft_t, pprfc_model=rfc_t, pp_model=pp_t,
                     use_cuda=False)
    with torch.no_grad():
        ref_out = torch.cat(list(ref_it), 0).numpy()

    def conv(name, tnet, **kw):
        m = ptc.get_model(name, init=False, **kw)
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        v = convert_state_dict(sd, m.shape_variables())
        return dataclasses.replace(
            m, variables=jax.tree_util.tree_map(jnp.asarray, v))

    my_it = ProPainterIterator(
        frames=TensorSequencer(jnp.asarray(frames.transpose(0, 2, 3, 1))),
        masks=TensorSequencer(jnp.asarray(masks.transpose(0, 2, 3, 1))),
        raft_model=conv("raft_things", raft_t, in_size=(H, W),
                        in_normalize=False, iters=20),
        pprfc_model=conv("propainter_rfc", rfc_t, in_size=(H, W)),
        pp_model=conv("propainter", pp_t, in_size=(H, W)))
    my_out = np.concatenate([np.asarray(c) for c in my_it],
                            0).transpose(0, 3, 1, 2)
    err = np.abs(my_out - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
    assert err < 1e-4
