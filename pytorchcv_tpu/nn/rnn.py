"""Recurrent cells with torch-compatible parameterization.

The LSTM mirrors torch ``nn.LSTM`` exactly: sequence-major input
(T, B, F), per-layer packed gate weights named ``weight_ih_l{k}`` /
``weight_hh_l{k}`` / ``bias_ih_l{k}`` / ``bias_hh_l{k}`` in (i, f, g, o)
gate order, inter-layer dropout. The recurrence runs under ``lax.scan`` —
the TPU-friendly formulation: one compiled step, weights resident in HBM,
(B, 4H) gate matmuls on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LSTM"]


class LSTM(nn.Module):
    """torch ``nn.LSTM`` (seq-major, unidirectional)."""

    hidden_size: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, b, _ = x.shape
        h_size = self.hidden_size

        def uniform_init(key, shape, dtype=jnp.float32):
            k = 1.0 / jnp.sqrt(h_size)
            return jax.random.uniform(key, shape, dtype, -k, k)

        out = x
        for layer in range(self.num_layers):
            in_features = out.shape[-1]
            w_ih = self.param(f"weight_ih_l{layer}", uniform_init,
                              (4 * h_size, in_features))
            w_hh = self.param(f"weight_hh_l{layer}", uniform_init,
                              (4 * h_size, h_size))
            b_ih = self.param(f"bias_ih_l{layer}", uniform_init,
                              (4 * h_size,))
            b_hh = self.param(f"bias_hh_l{layer}", uniform_init,
                              (4 * h_size,))
            xw = out @ w_ih.T + (b_ih + b_hh)  # hoisted input projection

            def step(carry, gates_x, w_hh=w_hh):
                h, c = carry
                gates = gates_x + h @ w_hh.T
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                g = jnp.tanh(g)
                o = jax.nn.sigmoid(o)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            init = (jnp.zeros((b, h_size), out.dtype),
                    jnp.zeros((b, h_size), out.dtype))
            _, out = jax.lax.scan(step, init, xw)
            if train and self.dropout_rate > 0.0 and \
                    layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout_rate,
                                 deterministic=False)(out)
        return out
