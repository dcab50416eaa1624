"""Input pipeline: device-side augmentation + prefetch loader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchcv_tpu.data import (PrefetchLoader, prefetch_to_mesh,
                                random_crop_flip, train_augment)
from pytorchcv_tpu.data.augment import random_resized_crop


def test_random_crop_flip_is_a_crop_of_the_padded_image():
    """Every augmented sample must equal some (offset, flip) view of the
    reflect-padded input — exhaustive search over the 9x9x2 candidates."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (4, 12, 12, 3)).astype(np.float32)
    out = np.asarray(random_crop_flip(jnp.asarray(x), jax.random.PRNGKey(1)))
    padded = np.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    for i in range(x.shape[0]):
        found = False
        for oy in range(9):
            for ox in range(9):
                crop = padded[i, oy:oy + 12, ox:ox + 12]
                if np.array_equal(out[i], crop) or \
                        np.array_equal(out[i], crop[:, ::-1]):
                    found = True
        assert found, f"sample {i} is not a crop/flip of the padded input"


def test_random_crop_flip_deterministic_per_key():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3), jnp.float32)
    a = random_crop_flip(x, jax.random.PRNGKey(7))
    b = random_crop_flip(x, jax.random.PRNGKey(7))
    c = random_crop_flip(x, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_random_resized_crop_full_box_is_identity():
    """With scale pinned to 1.0 and ratio pinned to the input's aspect,
    the crop box is the full image; an out_size equal to the input then
    reduces to (near-)identity resampling."""
    rng = np.random.RandomState(0)
    x = rng.rand(3, 16, 16, 3).astype(np.float32)
    out = random_resized_crop(jnp.asarray(x), jax.random.PRNGKey(0),
                              out_size=(16, 16), scale=(1.0, 1.0),
                              ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_train_augment_shapes_dtype_and_range():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (4, 64, 48, 3)), jnp.uint8)
    out = train_augment(x, jax.random.PRNGKey(0), out_size=(32, 32))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.bfloat16
    o = np.asarray(out, np.float32)
    # normalized ImageNet range: ~[-2.2, 2.8]
    assert o.min() > -3.5 and o.max() < 3.5
    # deterministic per key
    out2 = train_augment(x, jax.random.PRNGKey(0), out_size=(32, 32))
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(out2, np.float32))


def test_prefetch_loader_matches_direct_put():
    from pytorchcv_tpu.parallel import make_mesh

    mesh = make_mesh((8, 1))
    rng = np.random.RandomState(0)
    batches = [{"x": rng.rand(16, 4).astype(np.float32),
                "y": rng.randint(0, 9, 16).astype(np.int32)}
               for _ in range(5)]
    got = list(prefetch_to_mesh(iter(batches), mesh, size=3))
    assert len(got) == 5
    for raw, dev in zip(batches, got):
        assert "data" in [a for a in dev["x"].sharding.spec if a]
        np.testing.assert_array_equal(np.asarray(dev["x"]), raw["x"])
        np.testing.assert_array_equal(np.asarray(dev["y"]), raw["y"])


def test_prefetch_loader_tuple_batches_and_errors():
    batches = [(np.ones((2, 2), np.float32), np.zeros(2, np.int32))] * 3
    got = list(PrefetchLoader(iter(batches), size=2))
    assert len(got) == 3
    np.testing.assert_array_equal(np.asarray(got[0][0]), batches[0][0])

    def bad():
        yield batches[0]
        raise ValueError("boom")

    it = iter(PrefetchLoader(bad(), size=1))
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_feeds_train_step():
    """End-to-end: augment on device, prefetch over the mesh, train."""
    import optax

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.parallel import (make_mesh, make_train_step,
                                        shard_train_state)

    mesh = make_mesh((8, 1))
    model = ptc.get_model("resnet10", in_size=(32, 32))
    tx = optax.sgd(1e-2)
    state = shard_train_state(model, tx, mesh, style="fsdp")
    step = make_train_step(model, tx)

    rng = np.random.RandomState(0)
    raw = [(rng.randint(0, 256, (8, 40, 40, 3)).astype(np.uint8),
            rng.randint(0, 1000, 8).astype(np.int32)) for _ in range(3)]
    losses = []
    for i, (images, labels) in enumerate(prefetch_to_mesh(iter(raw), mesh)):
        x = train_augment(images, jax.random.PRNGKey(i), out_size=(32, 32),
                          dtype=jnp.float32)
        state, metrics = step(state, x, labels)
        losses.append(float(metrics["loss"]))
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
