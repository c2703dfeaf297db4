"""SGD with the reference's per-matrix gradient clipping and schedule.

Update rule (_cuda_mat_w_up, lib/layer_cuda.cu:1783-1832, invoked with
f_fixed=false — float master weights, lib/layer.c:2205-2207):

    norm = "L2 norm" of the accumulated batch delta
    w += lr/batch * delta * min(1, max_norm/norm) + lr * lambda * w

where the reference's norm is NOT the Frobenius norm: _cuda_l2_norm
(lib/layer_cuda.cu:1596-1622) launches one block per output row and
atomicAdds each row's L2 norm — the clip threshold is compared against the
SUM OF PER-ROW L2 NORMS.  Reproduced as-is (it only makes the clip fire
earlier than a true Frobenius clip would).

Our gradients are the descent form (d total-CE / d w); the reference's
delta is the ascent form (y-h chain) with w += lr*delta — identical update.

Per-parameter hyperparameters from the reference wiring:
  * lin_map H: clip threshold max_grad_l2_norm/2 (dense ctor arg,
    MemN2N/MemN2N.c:860) and learning rate lr*0.1 (the 'test_170409'
    update, MemN2N/MemN2N.c:1761);
  * scale: no clipping, divisor batch_size*dim (cuda_scale_w_up,
    lib/layer_cuda.cu:4857-4900);
  * everything else: clip threshold max_grad_l2_norm = 40 (define.h:208).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from qmann_tpu.config import QmannConfig

Params = Dict[str, jax.Array]


def rowsum_l2_norm(g: jax.Array) -> jax.Array:
    """Sum of per-row L2 norms over the last axis (the reference's clip
    metric, lib/layer_cuda.cu:1596-1622)."""
    return jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=-1)))


def _clip_scale(g: jax.Array, max_norm: float) -> jax.Array:
    norm = rowsum_l2_norm(g)
    return jnp.where(norm > max_norm, max_norm / norm, 1.0)


def sgd_update(params: Params, grads: Params, lr: jax.Array,
               batch_size: jax.Array, cfg: QmannConfig,
               scale_dim: int = 1) -> Params:
    """One reference SGD step on the whole parameter pytree.  grads are
    summed over the batch; batch_size is the live sample count of the
    batch (the last batch divides by its remainder,
    MemN2N/MemN2N.c:1222-1227).  scale_dim is the attention-score length
    used in the scale layer's batch*dim divisor (cuda_scale_w_up,
    lib/layer_cuda.cu:4884)."""
    lam = jnp.float32(cfg.lambda_)
    new: Params = {}
    for name, w in params.items():
        g = grads[name]
        if (cfg.en_grad_quant and cfg.grad_quant_placement == "update"
                and name not in ("scale",)):
            # EN_GRAD_QUANT "update" placement: the accumulated batch
            # gradient quantized once at the weight's format before the
            # update — the single-point deviation kept for comparison.
            # The default "backward" placement is the reference's f_fixed
            # threading (lib/layer.c:551-555), applied inside the ops'
            # custom VJPs (ops/qlinear.py) with FLOAT weight-grad
            # accumulation (lib/layer_cuda.cu:3266), so nothing happens
            # here.
            from qmann_tpu.numerics import float_quant
            fmt = cfg.fmt_ds_ans if name == "W" else cfg.fmt_w[0]
            g = float_quant(g, fmt)
        if name == "scale":
            # scale layer: divisor batch*dim (the reference uses the last
            # sample's live n_sen as dim; the padded memory length is the
            # batched analog), no gradient clipping (cuda_scale_w_up,
            # lib/layer_cuda.cu:4857-4900)
            new[name] = (w - lr / (batch_size * jnp.float32(scale_dim)) * g
                         + lr * lam * w)
            continue
        if name in ("maxout_w", "maxout_b"):
            # maxout trial parameters: plain SGD, no clip
            new[name] = w - lr / batch_size * g + lr * lam * w
            continue
        if name == "H":
            max_norm = cfg.max_grad_l2_norm / 2.0
            # the 0.1 lin_map factor is specific to the layer-wise tying
            # branch (MemN2N/MemN2N.c:1758); the adjacent-tying branch
            # updates lin_map with plain lr (MemN2N.c:1661)
            lr_eff = (lr * jnp.float32(0.1)
                      if cfg.type_weight_tying == 2 else lr)
        else:
            max_norm = cfg.max_grad_l2_norm
            lr_eff = lr
        if cfg.en_max_grad_l2_norm:
            if g.ndim == 3:
                # stacked per-hop instances (type-1 E / H): each matrix was
                # a separate layer in the reference -> clip per matrix
                scale = jax.vmap(lambda gi: _clip_scale(gi, max_norm))(g)
                g = g * scale[:, None, None]
            else:
                g = g * _clip_scale(g, max_norm)
        new[name] = w - lr_eff / batch_size * g + lr_eff * lam * w
    return new


def zero_null_columns(params: Params, cfg: QmannConfig) -> Params:
    """ZEROING_NULL_WEIGHT (define.h:313): after every batch update the
    NULL-word (index 0) input column of the memory embedding matrices is
    zeroed (MemN2N/MemN2N.c:1820-1851 — emb_m and emb_c only, not emb_q
    or ds_ans)."""
    if not cfg.zeroing_null_weight:
        return params
    out = dict(params)
    if cfg.type_weight_tying == 1:
        # emb_m[h] = E[0..K-1], emb_c[h] = E[1..K] -> all chain matrices
        out["E"] = out["E"].at[:, :, 0].set(0.0)
    else:
        out["A"] = out["A"].at[:, 0].set(0.0)
        out["C"] = out["C"].at[:, 0].set(0.0)
    return out


def sgd_momentum_update(params, grads, velocity, lr, batch_size, cfg,
                        momentum: float = 0.9):
    """Momentum SGD — the reference's commented-out alternative
    (lib/layer.c:2322-2330):

        v <- 0.9*v + lr/m * del ;  w <- w + v + lr*lambda*w

    translated to our descent-form grads (del is the ascent form,
    SURVEY.md 3.3):  v <- 0.9*v + lr/m*g ;  w <- w - v + lr*lambda*w.
    The lr sits INSIDE the velocity (past grads keep their then-lr) and
    there is no gradient clipping in this branch — both faithful to the
    commented code; the +lr*lambda*w weight-GROWTH term is the same quirk
    sgd_update reproduces (lib/layer_cuda.cu:1807-1815)."""
    import jax
    lam = jnp.float32(cfg.lambda_)
    new_v = jax.tree.map(
        lambda v, g: momentum * v + lr / batch_size * g, velocity, grads)
    new_p = jax.tree.map(lambda w, v: w - v + lr * lam * w, params, new_v)
    return new_p, new_v


def rmsprop_update(params, grads, second_moment, lr, batch_size, cfg,
                   decay: float = 0.9, eps: float = 1e-8):
    """RMSprop — the reference's commented-out alternative
    (lib/layer.c:2365-2375):

        acc <- 0.9*acc + 0.1*g^2 ;  w <- w + lr/m/sqrt(acc)*g + lr*lambda*w

    on the batch-summed gradient, descent form here.  eps guards the
    1/sqrt (the commented code divides unguarded — a documented
    sane-ification)."""
    import jax
    import jax.numpy as jnp
    lam = jnp.float32(cfg.lambda_)
    new_m = jax.tree.map(lambda m, g: decay * m + (1 - decay) * g * g,
                         second_moment, grads)
    new_p = jax.tree.map(
        lambda w, g, m: (w - lr / batch_size * g / (jnp.sqrt(m) + eps)
                         + lr * lam * w),
        params, grads, new_m)
    return new_p, new_m


def adamax_update(params, grads, state, lr, batch_size, cfg, t=None,
                  b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """AdaMax — the reference's commented-out alternative
    (lib/layer.c:2277-2318):

        m <- b1*m + (1-b1)*del ;  v <- max(b2*v, |del|)
        w <- w + lr/(1-b1) * m/v

    on the batch-summed gradient, descent form here.  The reference's
    denominator is the CONSTANT (1-b1) — not the b1^t bias correction of
    the published AdaMax — reproduced as-is (t is accepted and ignored
    for back-compat).  eps guards the division (the commented code
    divides unguarded)."""
    import jax
    import jax.numpy as jnp
    m, u = state
    new_m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
    new_u = jax.tree.map(lambda uu, g: jnp.maximum(b2 * uu, jnp.abs(g)),
                         u, grads)
    new_p = jax.tree.map(
        lambda w, mm, uu: w - lr / (1.0 - b1) * mm / (uu + eps),
        params, new_m, new_u)
    return new_p, (new_m, new_u)


def lr_schedule(cfg: QmannConfig):
    """Generator of (epoch, lr, remove_softmax) replicating
    MemN2N/MemN2N.c:1078-1099: during linear start (first
    num_itr_linear_start epochs when enabled) the softmax is removed and
    lr = LR/2; afterwards lr restarts at LR and halves every
    RATE_DECAY_STEP epochs (counted from the linear-start boundary,
    excluding the boundary itself).

    With linear start the total run is extended to
    NUM_ITR + NUM_ITR_LINEAR_START epochs (MemN2N/MemN2N.c:1037-1043)."""
    nls = cfg.num_itr_linear_start if cfg.en_linear_start else 0
    lr = cfg.learning_rate
    was_removed = False
    for itr in range(cfg.num_itr + nls):
        if cfg.en_linear_start and itr < nls:
            yield itr, cfg.learning_rate / 2.0, True
            was_removed = True
            continue
        if was_removed:
            lr = cfg.learning_rate
            was_removed = False
        if (itr - nls) % cfg.rate_decay_step == 0 and itr != nls:
            lr = lr / 2.0
        yield itr, lr, False
