"""Cost functions: cross entropy (the model's loss) and squared error
(a kept capability, lib/layer.c:3576-3632).

Reference cross entropy (lib/layer.h:376-420, kernels
lib/layer_cuda.cu:2191-2251):
  * reported "cost" accumulates -h[y] where h is the softmax *probability*
    (not log-probability) — _cuda_cross_entropy_cost:2196-2198;
  * gradient is y - h, injected directly as the gradient w.r.t. the output
    softmax's *input* (the output softmax has no backward pass —
    MemN2N/MemN2N.c:1532-1539 goes straight from cross_entropy_run to
    dense_bwd(ds_ans)).  That is exactly the fused softmax+CE gradient, so
    we compute the loss as standard -sum(y*log_softmax(logits)) whose
    autodiff gradient is h - y (descent form of the same update);
  * prediction = argmax of h with ties resolved to the LAST maximal index
    (the _cuda_max_i tree reduction keeps the later index on ties,
    lib/layer_cuda.cu:1918-1939);
  * match counts and costs are accumulated per split (train/valid/test).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CEMetrics(NamedTuple):
    loss: jax.Array      # scalar: standard CE summed over batch (for grads)
    cost: jax.Array      # scalar: reference-style sum of -p[y] (reporting)
    matches: jax.Array   # scalar int32: number of correct predictions
    pred: jax.Array      # [...]: predicted class indices


def argmax_last(x: jax.Array, axis: int = -1) -> jax.Array:
    """Argmax with ties going to the LAST maximal index, matching the
    reference's _cuda_max_i tree reduction (lib/layer_cuda.cu:1918-1939:
    the comparison `a > b ? keep a : take b` prefers the later index)."""
    n = x.shape[axis]
    rev = jnp.flip(x, axis=axis)
    return n - 1 - jnp.argmax(rev, axis=axis)


def cross_entropy(logits: jax.Array, y_onehot: jax.Array) -> CEMetrics:
    """logits: [..., K]; y_onehot: [..., K] (one-hot answers,
    MemN2N/sample.c:566-570)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(y_onehot * logp)
    probs = jax.lax.stop_gradient(jnp.exp(logp))
    cost = -jnp.sum(y_onehot * probs)
    pred = argmax_last(jax.lax.stop_gradient(logits), axis=-1)
    hit = jnp.take_along_axis(y_onehot, pred[..., None], axis=-1)[..., 0]
    matches = jnp.sum((hit == 1.0).astype(jnp.int32))
    return CEMetrics(loss=loss, cost=cost, matches=matches, pred=pred)


def squared_error(h: jax.Array, y: jax.Array) -> jax.Array:
    """se layer (lib/layer.h:464-479): cost 0.5*sum((h-y)^2), gradient h-y."""
    return 0.5 * jnp.sum((h - y) ** 2)
