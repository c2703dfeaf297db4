"""Element-wise layers: residual sum, activations, learnable scale,
element-wise multiplies, maxout — the remaining rows of the reference's
layer library (SURVEY.md section 2.3).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from qmann_tpu.numerics import QFormat, float_quant


# ---------------------------------------------------------------------------
# sum_vec: hop residual u_next = H u + o  (lib/layer.h:131-183)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def qsum(a: jax.Array, b: jax.Array, fmt: QFormat,
         quantized: bool = True) -> jax.Array:
    """sum_vec forward: Q(Q(a)+Q(b)) when fixed (_cuda_vec_vec_sum,
    lib/layer_cuda.cu:1534-1543); backward passes the gradient through to
    both inputs unchanged (sum_vec_bwd, lib/layer.c:1536-1559)."""
    if not quantized:
        return a + b
    return float_quant(float_quant(a, fmt) + float_quant(b, fmt), fmt)


def _qsum_fwd(a, b, fmt, quantized):
    return qsum(a, b, fmt, quantized), None


def _qsum_bwd(fmt, quantized, _, g):
    return g, g


qsum.defvjp(_qsum_fwd, _qsum_bwd)


# ---------------------------------------------------------------------------
# activation layer (lib/layer.h:607-655; kernels lib/layer_cuda.cu:1664-1731)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def activation(x: jax.Array, kind: str, fmt: Optional[QFormat],
               quantized: bool = False,
               grad_quantized: bool = False) -> jax.Array:
    """'NULL' (bypass), 'SIGMOID', 'RELU'.  When quantized, the OUTPUT is
    re-quantized (the fwd kernels use the layer's f_fixed directly).  The
    backward gradient is quantized only under grad_quantized — the
    reference threads f_fixed into activation_bwd under #ifdef
    EN_GRAD_QUANT (lib/layer.c:4280-4288), so without EN_GRAD_QUANT the
    relu/sigmoid derivative stays float even in a fixed-point run
    (_cuda_sigmoid_bwd/_cuda_relu_bwd, lib/layer_cuda.cu:1705-1731)."""
    return _activation_impl(x, kind, fmt, quantized)


def _activation_impl(x, kind, fmt, quantized):
    if kind == "SIGMOID":
        out = jax.nn.sigmoid(x)
    elif kind == "RELU":
        out = jnp.maximum(x, 0.0)
    else:  # NULL / bypass
        out = x
    if quantized and fmt is not None and kind != "NULL":
        out = float_quant(out, fmt)
    elif quantized and fmt is not None and kind == "NULL":
        out = float_quant(out, fmt)  # _cuda_bypass quantizes too (:1669)
    return out


def _activation_fwd(x, kind, fmt, quantized, grad_quantized):
    out = _activation_impl(x, kind, fmt, quantized)
    return out, out


def _activation_bwd(kind, fmt, quantized, grad_quantized, out, g):
    if kind == "SIGMOID":
        dg = g * out * (1.0 - out)   # sigmoid_deriv on the OUTPUT
    elif kind == "RELU":
        dg = jnp.where(out > 0.0, g, 0.0)
    else:
        dg = g
    if grad_quantized and fmt is not None and kind in ("SIGMOID", "RELU"):
        dg = float_quant(dg, fmt)
    return (dg,)


activation.defvjp(_activation_fwd, _activation_bwd)


# ---------------------------------------------------------------------------
# scale layer: learnable scalar before the attention softmax
# (lib/layer.h:754-810; EN_SC_ATT, off by default MemN2N/define.h:59)
# ---------------------------------------------------------------------------

def scale_apply(w: jax.Array, x: jax.Array) -> jax.Array:
    """out = w * x with scalar w (cuda_scale_fwd -> _cuda_vec_const_mult,
    lib/layer_cuda.cu:4804-4825).  Plain autodiff reproduces the reference
    backward: w_del += sum(g*x), grad = w*g (cuda_scale_bwd :4828-4855).
    Note the scale's SGD update divides by batch_size*dim
    (cuda_scale_w_up :4884) — handled in train/optim."""
    return w * x


# ---------------------------------------------------------------------------
# mult_e_vec / mult_e_mat: element-wise multiplies (lib/layer.h:485-601)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def qmult(a: jax.Array, b: jax.Array, fmt: QFormat,
          quantized: bool = True) -> jax.Array:
    """Element-wise multiply with FIXED_MUL when fixed
    (cuda_mult_e_vec/mat_fwd, lib/layer_cuda.cu:4175-4433); float
    cross-gradients on the raw inputs in backward."""
    if not quantized:
        return a * b
    return float_quant(float_quant(a, fmt) * float_quant(b, fmt), fmt)


def _qmult_fwd(a, b, fmt, quantized):
    return qmult(a, b, fmt, quantized), (a, b)


def _qmult_bwd(fmt, quantized, res, g):
    a, b = res
    return g * b, g * a


qmult.defvjp(_qmult_fwd, _qmult_bwd)


# ---------------------------------------------------------------------------
# maxout (CPU-only experimental layer, lib/layer.c:3332-3570; used by the
# MemN2N_maxout_trial driver)
# ---------------------------------------------------------------------------

def maxout(x: jax.Array, num_pieces: int) -> jax.Array:
    """Maxout over groups of `num_pieces` consecutive features:
    [..., K*num_pieces] -> [..., K].  Autodiff routes the gradient to the
    argmax piece, matching maxout_bwd (lib/layer.c:3470-3520)."""
    *lead, d = x.shape
    assert d % num_pieces == 0, "feature dim must be divisible by num_pieces"
    return jnp.max(x.reshape(*lead, d // num_pieces, num_pieces), axis=-1)
