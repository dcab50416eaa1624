"""Training convergence on the 8-device mesh (VERDICT r2 item 4/7): the
trainer must not just take equality-tested steps — the loss must actually
fall, and the FSDP (ZeRO-3) layout must reproduce the DP trajectory.

resnet20_cifar10 on one synthetic batch: 50 full-batch SGD steps overfit
it; loss must drop by >50%. Both states see identical math (same init,
same batch, same fold_in(step) dropout keys), so their loss trajectories
must agree to f32 roundoff regardless of layout.
"""

import numpy as np

import jax.numpy as jnp


def test_fsdp_matches_dp_and_converges():
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (make_mesh, make_train_step,
                                        shard_batch, shard_train_state)

    mesh = make_mesh((8, 1))
    tx = optax.sgd(0.05, momentum=0.9)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(64, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 10, 64), jnp.int32)
    im = shard_batch(mesh, images)
    lb = shard_batch(mesh, labels)

    def run(style):
        model = ptc.get_model("resnet20_cifar10")   # same rng=0 init
        state = shard_train_state(model, tx, mesh, style=style, ema=True)
        step = make_train_step(model, tx, ema_decay=0.9)
        losses = []
        for _ in range(50):
            state, metrics = step(state, im, lb)
            losses.append(float(metrics["loss"]))
        return state, losses

    dp_state, dp_losses = run("tp")      # min_tp_features=256 > every
    fsdp_state, fsdp_losses = run("fsdp")  # resnet20 kernel: pure DP

    assert all(np.isfinite(l) for l in dp_losses)
    # Convergence: >50% drop while overfitting the synthetic batch.
    assert dp_losses[-1] < 0.5 * dp_losses[0], (
        f"loss did not halve: {dp_losses[0]:.4f} -> {dp_losses[-1]:.4f}")

    # Layout independence: FSDP trajectory == DP trajectory. The math is
    # identical; XLA reduction orders may differ between partitionings,
    # so roundoff-grade tolerance rather than bitwise.
    np.testing.assert_allclose(fsdp_losses, dp_losses, rtol=2e-4,
                               atol=2e-5)

    # EMA shadows must track the params (ADVICE r2: they were frozen).
    p = dp_state.params["features"]["init_block"]["conv"]["kernel"]
    e = dp_state.ema_params["features"]["init_block"]["conv"]["kernel"]
    d = float(jnp.max(jnp.abs(p - e)))
    assert 0 < d, "EMA identical to params (decay ignored?)"
    model0 = ptc.get_model("resnet20_cifar10")
    k0 = model0.variables["params"]["features"]["init_block"]["conv"][
        "kernel"]
    assert float(jnp.max(jnp.abs(e - k0))) > 0, "EMA never updated"
