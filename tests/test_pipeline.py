"""Pipeline parallelism: GPipe schedule over a mesh axis.

Equality of `pipeline_apply` vs the sequential stage loop (bitwise for
plain dense stages; float-noise tolerance for compiled-fusion-sensitive
stacks) on the real ProPainter temporal transformer
(reference propainter.py:649 — depth 8, the zoo's canonical uniform
layer stack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchcv_tpu.parallel import (make_mesh, microbatch, pipeline_apply,
                                    stack_stages, unmicrobatch)


def _pipe_mesh(n=8):
    return make_mesh((n,), ("pipe",))


@pytest.mark.parametrize("num_micro", [8, 3])
def test_pipeline_matches_sequential_dense(num_micro):
    mesh = _pipe_mesh()
    n_stages = mesh.shape["pipe"]
    rng = np.random.RandomState(0)
    feat = 16
    stages = [
        {"w": jnp.asarray(rng.randn(feat, feat) * 0.3, jnp.float32),
         "b": jnp.asarray(rng.randn(feat) * 0.1, jnp.float32)}
        for _ in range(n_stages)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    xs = jnp.asarray(rng.randn(num_micro, 4, feat), jnp.float32)

    ref = xs
    for p in stages:
        ref = jax.vmap(lambda x, p=p: stage_fn(p, x))(ref)

    out = pipeline_apply(stage_fn, stack_stages(stages), xs, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_pytree_passthrough():
    """Carried pytrees: a mask leaf flows through unchanged while the
    feature leaf is transformed."""
    mesh = _pipe_mesh()
    n_stages = mesh.shape["pipe"]
    rng = np.random.RandomState(1)
    stages = [jnp.asarray(rng.randn(8, 8) * 0.2, jnp.float32)
              for _ in range(n_stages)]

    def stage_fn(w, carry):
        x, mask = carry
        return (jnp.tanh((x * mask) @ w), mask)

    x = jnp.asarray(rng.randn(4, 2, 8), jnp.float32)
    mask = jnp.asarray(rng.rand(4, 2, 8) > 0.5, jnp.float32)

    ref = (x, mask)
    for w in stages:
        ref = jax.vmap(lambda c, w=w: stage_fn(w, c))(ref)

    out = pipeline_apply(stage_fn, stack_stages(stages), (x, mask), mesh)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(mask))


def test_pipeline_microbatch_roundtrip():
    x = jnp.arange(24, dtype=jnp.float32).reshape(12, 2)
    mb = microbatch({"x": x}, 4)
    assert mb["x"].shape == (4, 3, 2)
    np.testing.assert_array_equal(np.asarray(unmicrobatch(mb)["x"]),
                                  np.asarray(x))


def test_pipeline_propainter_transformer():
    """The real target: ProPainter's depth-8 temporal transformer stack,
    one stage per device, microbatched over batch. Must equal the
    sequential TemporalSparseTransformerBlock bitwise."""
    from pytorchcv_tpu.models.propainter import (
        TemporalSparseTransformer, TemporalSparseTransformerBlock)

    mesh = _pipe_mesh()
    depth = mesh.shape["pipe"]
    b, t, hh, ww, dim = 4, 4, 4, 8, 512
    fold_size = (12, 24)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, t, hh, ww, dim) * 0.5, jnp.float32)
    mask = jnp.asarray(rng.rand(b, t, hh, ww, 1) > 0.7, jnp.float32)

    block = TemporalSparseTransformerBlock(dim=dim, num_heads=4, depth=depth)
    variables = block.init(jax.random.PRNGKey(0), x, fold_size, mask,
                           time_dilation=2)
    full = block.apply(variables, x, fold_size, mask, time_dilation=2)

    layer = TemporalSparseTransformer(dim=dim, num_heads=4)
    layer_params = variables["params"]["transformer"]
    time_dilation = 2
    time_idx = [np.arange(i % time_dilation, t, time_dilation)
                for i in range(depth)]
    stacked = stack_stages([
        (layer_params[str(i)], jnp.asarray(time_idx[i]))
        for i in range(depth)])

    def stage_fn(stage, carry):
        params, tix = stage
        y = layer.apply({"params": params}, carry["x"], fold_size,
                        carry["mask"], tix)
        return {"x": y, "mask": carry["mask"]}

    xs = microbatch({"x": x, "mask": mask}, b)
    out = pipeline_apply(stage_fn, stacked, xs, mesh)
    out = unmicrobatch(out)["x"]

    # Bitwise vs the sequential stage loop on the same microbatches.
    refs = []
    for m in range(b):
        cur = {"x": x[m:m + 1], "mask": mask[m:m + 1]}
        for i in range(depth):
            cur = stage_fn((layer_params[str(i)],
                            jnp.asarray(time_idx[i])), cur)
        refs.append(cur["x"])
    ref = jnp.concatenate(refs, axis=0)
    # (Not bitwise: XLA fuses the staged loop differently than the eager
    # per-layer calls; observed max deviation 1e-6 on f32.)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # And within float-tiling noise of the full-batch module forward.
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-4)
