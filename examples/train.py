"""Train / fine-tune a zoo model across a device mesh.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train.py [model_name] [--fsdp] [--accum 2] [--remat]

The reference ships no trainer (training lives in its external imgclsmob
repo — SURVEY.md §0); this framework provides one natively. The full
memory ladder is shown: data parallelism over the ``data`` mesh axis,
tensor parallelism over ``model`` (default) or ZeRO-3 FSDP (``--fsdp``:
params/grads/moments sharded 1/n over ``data``), gradient accumulation
(``--accum k``), and jax.checkpoint rematerialization (``--remat``).
Synthetic data stands in for a dataset in this environment; swap
``synthetic_batches`` for a real input pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorchcv_tpu as ptc
from pytorchcv_tpu.data import prefetch_to_mesh, train_augment
from pytorchcv_tpu.parallel import (make_mesh, make_train_step,
                                    shard_train_state)


def synthetic_batches(rng, batch, raw_size, num_classes, steps):
    """Stand-in for a dataset: raw uint8 frames + labels."""
    for _ in range(steps):
        yield (rng.randint(0, 256, (batch, *raw_size, 3)).astype(np.uint8),
               rng.randint(0, num_classes, batch).astype(np.int32))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "-") else "resnet10"
    style = "fsdp" if "--fsdp" in sys.argv else "tp"
    accum = int(sys.argv[sys.argv.index("--accum") + 1]) \
        if "--accum" in sys.argv else 1
    remat = "--remat" in sys.argv

    in_size, batch, steps = (64, 64), 32, 10
    model = ptc.get_model(name, in_size=in_size)

    n = len(jax.devices())
    model_par = 2 if style == "tp" and n % 2 == 0 else 1
    mesh = make_mesh((n // model_par, model_par))
    print(f"mesh={dict(mesh.shape)} style={style} accum={accum} "
          f"remat={remat} params={model.num_params():,}")

    tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.sgd(optax.cosine_decay_schedule(0.1, steps), momentum=0.9),
    )
    state = shard_train_state(model, tx, mesh, style=style)
    step = make_train_step(model, tx, accum_steps=accum, remat=remat)

    # Native input pipeline: raw uint8 batches staged onto the mesh by a
    # background thread, augmented by one jitted device program.
    rng = np.random.RandomState(0)
    raw_size = (in_size[0] + 16, in_size[1] + 16)
    source = synthetic_batches(rng, batch, raw_size, 1000, steps)
    for i, (images, labels) in enumerate(prefetch_to_mesh(source, mesh)):
        x = train_augment(images, jax.random.PRNGKey(i), out_size=in_size,
                          dtype=jnp.float32)
        state, metrics = step(state, x, labels)
        print(f"step {i}: loss={float(metrics['loss']):.4f} "
              f"acc={float(metrics['accuracy']):.3f}")

    # Fold the trained params back into the Model wrapper and checkpoint.
    import dataclasses
    trained = dataclasses.replace(model, variables={
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)})
    path = trained.save("/tmp/trained_example.msgpack")
    print("saved:", path)


if __name__ == "__main__":
    main()
