"""Maxout-attention MemN2N — the reference's experimental trial driver
(MemN2N/MemN2N_maxout_trial.c, CPU-only, not built by the Makefile).

The trial replaces the attention softmax with a learned scalar maxout
unit applied to each attention score (dim_in=1, 5 pieces, dim_out=1 —
MemN2N_maxout_trial.c:228-238, :373-388), normalized by the plain sum of
the outputs (:380-387).  The maxout layer itself is lib/layer.c:3332-3570.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def maxout_unit(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar maxout over pieces: out = max_k(w_k * x + b_k).
    x: [...]; w, b: [pieces]."""
    return jnp.max(x[..., None] * w + b, axis=-1)


def maxout_attention(scores: jax.Array, w: jax.Array, b: jax.Array,
                     mask: jax.Array) -> jax.Array:
    """Per-score maxout followed by sum normalization
    (MemN2N_maxout_trial.c:373-388); padded rows excluded."""
    a = maxout_unit(scores, w, b)
    a = jnp.where(mask, a, 0.0)
    total = jnp.sum(a, axis=-1, keepdims=True)
    total = jnp.where(total == 0.0, 1.0, total)
    return a / total


def init_maxout_params(key: jax.Array, pieces: int = 5):
    """Gaussian(0, 0.1) like every other reference weight
    (lib/layer.c:3380-ish maxout_init)."""
    kw, kb = jax.random.split(key)
    return (0.1 * jax.random.normal(kw, (pieces,), jnp.float32),
            0.1 * jax.random.normal(kb, (pieces,), jnp.float32))
