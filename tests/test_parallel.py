"""Multi-chip tier: sharded inference + training on the 8-device CPU mesh
(substitutes for real chips exactly as the driver's dryrun does)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_inference():
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (data_parallel_infer_fn, make_mesh,
                                        shard_batch)

    model = ptc.get_model("resnet10", in_size=(64, 64))
    mesh = make_mesh((8, 1))
    fn = data_parallel_infer_fn(model, mesh, donate_input=False)
    x = shard_batch(mesh, jnp.asarray(
        np.random.RandomState(0).rand(16, 64, 64, 3), jnp.float32))
    y = fn(model.variables, x)
    assert y.shape == (16, 1000)
    # sharded result must equal single-device result
    y_ref = model.module.apply(model.variables,
                               jax.device_get(x), train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_spatial_partitioned_inference():
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import make_mesh, spatial_infer_fn

    model = ptc.get_model("resnet10", in_size=(64, 64))
    mesh = make_mesh((8, 1))
    fn = spatial_infer_fn(model, mesh)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    y = fn(model.variables, x)
    y_ref = model.module.apply(model.variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_train_step():
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (make_mesh, make_train_step,
                                        shard_batch, shard_train_state)

    model = ptc.get_model("resnet10", in_size=(64, 64))
    mesh = make_mesh((4, 2))
    tx = optax.sgd(1e-2, momentum=0.9)
    state = shard_train_state(model, tx, mesh, min_tp_features=128)
    step = make_train_step(model, tx)
    rng = np.random.RandomState(0)
    images = shard_batch(mesh, jnp.asarray(rng.rand(8, 64, 64, 3),
                                           jnp.float32))
    labels = shard_batch(mesh, jnp.asarray(rng.randint(0, 1000, 8),
                                           jnp.int32))
    losses = []
    for _ in range(3):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[2] < losses[0], f"loss not decreasing: {losses}"


def test_driver_dryrun_multichip(capfd):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
    # The sharded phases must compose without GSPMD resorting to full
    # replication at a layout boundary (VERDICT r2: TP-state -> spatial
    # handoff used to trigger this on stage2 identity_conv kernels).
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err


def test_multihost_feed_sharded_matches_device_put():
    """feed_sharded assembles a global array from process-local data; in
    a single-process job it must equal a plain sharded device_put, and
    flow through a sharded forward unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (data_parallel_infer_fn,
                                        feed_sharded, initialize_multihost,
                                        make_global_mesh)

    initialize_multihost()            # no-op single process
    mesh = make_global_mesh((8, 1))
    rng = np.random.RandomState(0)
    batch = rng.rand(16, 64, 64, 3).astype(np.float32)
    fed = feed_sharded(mesh, batch)
    assert fed.shape == (16, 64, 64, 3)
    direct = jax.device_put(jnp.asarray(batch),
                            NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(np.asarray(fed), np.asarray(direct))

    model = ptc.get_model("resnet10", in_size=(64, 64))
    fn = data_parallel_infer_fn(model, mesh, donate_input=False)
    y_fed = np.asarray(fn(model.variables, fed))
    y_dir = np.asarray(fn(model.variables, direct))
    np.testing.assert_array_equal(y_fed, y_dir)


def test_fsdp_train_step():
    """ZeRO-3 style: params/grads/moments sharded over data; loss decreases
    and the big leaves really are 1/n per device."""
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (make_mesh, make_train_step,
                                        shard_batch, shard_train_state)

    model = ptc.get_model("resnet10", in_size=(64, 64))
    mesh = make_mesh((8, 1))
    tx = optax.adam(1e-3)
    state = shard_train_state(model, tx, mesh, style="fsdp")

    # the classifier kernel (512x1000) must actually be sharded over data
    fc = state.params["output"]["kernel"]
    spec = fc.sharding.spec
    assert "data" in [ax for ax in spec if ax], f"fc not sharded: {spec}"

    step = make_train_step(model, tx)
    rng = np.random.RandomState(0)
    images = shard_batch(mesh, jnp.asarray(rng.rand(16, 64, 64, 3),
                                           jnp.float32))
    labels = shard_batch(mesh, jnp.asarray(rng.randint(0, 1000, 16),
                                           jnp.int32))
    losses = []
    for _ in range(3):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[2] < losses[0], f"loss not decreasing: {losses}"
    # params keep their sharded layout through the donated update
    spec2 = state.params["output"]["kernel"].sharding.spec
    assert "data" in [ax for ax in spec2 if ax]


def test_remat_step_matches_plain():
    """jax.checkpoint changes memory, not math: one remat step must equal
    one plain step on identical state."""
    import copy
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (create_train_state, make_train_step)

    model = ptc.get_model("resnet10", in_size=(32, 32))
    tx = optax.sgd(1e-2)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, 4), jnp.int32)

    # donate_argnums deletes the state buffers, and both states would
    # alias model.variables — hand each step its own copy
    fresh = lambda: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), create_train_state(model, tx))
    s_plain, m_plain = make_train_step(model, tx)(fresh(), images, labels)
    s_remat, m_remat = make_train_step(model, tx, remat=True)(
        fresh(), images, labels)
    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_remat["loss"]), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves(s_plain.params)
    flat_r = jax.tree_util.tree_leaves(s_remat.params)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_step():
    """accum_steps=2 halves the per-microbatch size; training still
    converges and the step counter advances once per call."""
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import create_train_state, make_train_step

    model = ptc.get_model("resnet10", in_size=(32, 32))
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, tx)
    step = make_train_step(model, tx, accum_steps=2)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, 8), jnp.int32)
    losses = []
    for _ in range(3):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[2] < losses[0], f"loss not decreasing: {losses}"
