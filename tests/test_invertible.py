"""Invertibility tier: i-RevNet's bijective feature stack must reconstruct
its input through :func:`irevnet_inverse` (analog of the reference's
IRevNet.inverse smoke check in irevnet.py:_test). A small valid config is
used — the full 301-layer net is bijective in exact arithmetic but its
random-init activations overflow fp32 cancellation."""

import numpy as np


def test_irevnet_inverse_reconstructs_input():
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.models.irevnet import IRevNet, irevnet_inverse

    mod = IRevNet(channels=((24, 24), (96,)), init_block_channels=12,
                  final_block_channels=192, return_out_bij=True,
                  in_size=(56, 56), num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 56, 56, 3),
                    jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    y, bij = mod.apply(variables, x, train=False)
    assert y.shape == (2, 10)
    x_rec = irevnet_inverse(mod, variables, bij)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4


def test_revnet_reversible_block_inverse():
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.models.revnet import (ReversibleBlock,
                                             reversible_block_inverse)

    blk = ReversibleBlock(out_channels2=8, bottleneck=False,
                          preactivate=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(variables, x, train=False)
    x_rec = reversible_block_inverse(blk, variables, y)
    assert float(jnp.abs(x_rec - x).max()) < 1e-5
