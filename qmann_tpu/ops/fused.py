"""Fused attention read as a differentiable op.

Forward: one Pallas program per batch tile computing the whole hop read
(score -> masked softmax -> quantized weighted sum) with every
intermediate VMEM-resident — the TPU fusion of the four kernels the
reference launches per hop (_cuda_mat_mat_trans_product / the mode-3
_cuda_approximate_attention, _cuda_max, _cuda_softmax_fwd,
_cuda_mat_trans_mat_product; lib/layer_cuda.cu:105-172, :355-541,
:1969-2060, :547-635).

Backward: the raw-float composition of the three ops' reference VJPs
(qscore / softmax / qweighted_sum — the reference never quantizes
gradients, lib/layer.c:551-555); in mode 3 the score VJP is the
reference's hand-crafted Hamming surrogate
(_cuda_backprop_grad_out_mat/vec, lib/layer_cuda.cu:742-1464) — so
training under use_pallas is gradient-identical to the unfused path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qmann_tpu.numerics import QFormat


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                                    16))
def fused_attention_read(m: jax.Array, c: jax.Array, u: jax.Array,
                         mask_f: jax.Array, fmt_att: QFormat,
                         fmt_bin: QFormat, fmt_act: QFormat,
                         score_quantized: bool = True,
                         sum_quantized: bool = True,
                         batch_tile: int = 0,
                         interpret: bool = False,
                         attention_mode: int = 2,
                         ham_num_bit: int = 8,
                         ham_const_scale: int = -3,
                         ham_weight_para: int = 0,
                         ham_weighted: bool = True,
                         sum_grad_quantized: bool = False):
    """m, c: [B, M, D]; u: [B, D]; mask_f: [B, M] float (1 live/0 pad)
    -> (o [B, D], p [B, M], scores [B, M]).

    Bit-identical to attention_score(mode 1/2/3) -> apply_softmax ->
    qweighted_sum; scores are returned raw (pre-mask), as the unfused
    path reports them.  attention_mode=3 runs the Hamming bit-lattice at
    the full-width format (fmt_att.iwl, 31-iwl) with the ham_* knobs.
    sum_grad_quantized selects qweighted_sum's quantized backward
    contractions (mandatory for fixed-point mode 3, where the reference
    passes f_fixed unconditionally — lib/layer.c:588-599)."""
    return _fused_fwd_impl(m, c, u, mask_f, fmt_att, fmt_bin, fmt_act,
                           score_quantized, sum_quantized, batch_tile,
                           interpret, attention_mode, ham_num_bit,
                           ham_const_scale, ham_weight_para, ham_weighted)


def _fused_fwd_impl(m, c, u, mask_f, fmt_att, fmt_bin, fmt_act,
                    score_quantized, sum_quantized, batch_tile, interpret,
                    attention_mode, ham_num_bit, ham_const_scale,
                    ham_weight_para, ham_weighted):
    from qmann_tpu.ops.pallas.qkernels import (
        DEFAULT_BATCH_TILE, fused_attention_read_pallas,
    )
    return fused_attention_read_pallas(
        m, c, u, mask_f.astype(jnp.int32), fmt_att, fmt_bin, fmt_act,
        score_quantized=score_quantized, sum_quantized=sum_quantized,
        batch_tile=batch_tile or DEFAULT_BATCH_TILE, interpret=interpret,
        attention_mode=attention_mode, ham_num_bit=ham_num_bit,
        ham_const_scale=ham_const_scale, ham_weight_para=ham_weight_para,
        ham_weighted=ham_weighted)


def _fused_fwd(m, c, u, mask_f, fmt_att, fmt_bin, fmt_act,
               score_quantized, sum_quantized, batch_tile, interpret,
               attention_mode, ham_num_bit, ham_const_scale,
               ham_weight_para, ham_weighted, sum_grad_quantized):
    o, p, scores = _fused_fwd_impl(m, c, u, mask_f, fmt_att, fmt_bin,
                                   fmt_act, score_quantized, sum_quantized,
                                   batch_tile, interpret, attention_mode,
                                   ham_num_bit, ham_const_scale,
                                   ham_weight_para, ham_weighted)
    return (o, p, scores), (m, c, u, mask_f, p)


def _fused_bwd(fmt_att, fmt_bin, fmt_act, score_quantized, sum_quantized,
               batch_tile, interpret, attention_mode, ham_num_bit,
               ham_const_scale, ham_weight_para, ham_weighted,
               sum_grad_quantized, res, cts):
    m, c, u, mask_f, p = res
    do, dp_in, ds_in = cts
    # weighted-sum backward: the ONE implementation of the reference
    # rules (float / quantized-contraction branches) lives in
    # qlinear._qweighted_sum_bwd — delegate rather than duplicate
    from qmann_tpu.ops.qlinear import _qweighted_sum_bwd
    dc, dp, _ = _qweighted_sum_bwd(fmt_act, sum_quantized,
                                   sum_grad_quantized, (c, p, mask_f), do)
    dp = dp + dp_in
    # softmax bwd p*(g - sum(p*g)) (_cuda_softmax_bwd,
    # lib/layer_cuda.cu:2130-2147); padded entries have p == 0
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    ds = ds + ds_in
    if attention_mode == 3:
        # the reference's hand-crafted Hamming surrogate
        # (_cuda_backprop_grad_out_mat/vec, lib/layer_cuda.cu:742-1464)
        from qmann_tpu.ops.attention import _hamming_bwd
        dm, du = _hamming_bwd(fmt_att.iwl, ham_num_bit, ham_const_scale,
                              fmt_att.mode, "jnp", ham_weight_para,
                              ham_weighted, (m, u), ds)
    else:
        # qscore bwd on raw tensors (lib/layer_cuda.cu:2597-2609)
        dm = ds[..., :, None] * u[..., None, :]
        du = jnp.einsum("...md,...m->...d", m, ds,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return dm, dc, du, jnp.zeros_like(mask_f)


fused_attention_read.defvjp(_fused_fwd, _fused_bwd)
