"""Pallas TPU kernels for the hot quantized ops.

The reference's hot loop is the per-sample forward/backward with ~40 CUDA
kernel launches per sample (SURVEY.md section 3.1).  The XLA path already
fuses the per-product-quantized contractions into loop fusions; these
Pallas kernels additionally guarantee VMEM residency of the whole
product lattice and fuse the attention-read chain
(embed -> score -> softmax -> weighted sum) into a single program, so
the [B,M,D]-sized intermediates never round-trip HBM.

All kernels reproduce the reference semantics bit-for-bit for quantized
values: per-product re-quantization to the first operand's format, float
accumulation, and output re-quantization (lib/layer_cuda.cu:49-172); the
Hamming kernel matches _cuda_approximate_attention (:355-541).  Because
quantized products lie on the 2^-frac grid, the in-kernel reduction order
is irrelevant (sums are exact in f32), so the Pallas and jnp paths agree
exactly — checked by tests/test_pallas.py.

Grid strategy: one program per batch tile (DEFAULT_BATCH_TILE = 32); at
the reference's dims the feature axes (I <= ~192, O/D <= ~128, M <= 64)
stay whole inside VMEM, keeping the largest scratch (the [TB, O, I]
product lattice) in the single-digit-MB range.  For configurations whose
lattice would exceed VMEM, qmatvec_pallas additionally tiles the O and I
axes (o_tile/i_tile, auto-enabled past _AUTO_TILE_LATTICE_BYTES) with an
f32 VMEM accumulator across I-blocks — exact, because quantized products
lie on the 2^-frac grid so partial sums are order-independent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qmann_tpu.numerics import QFormat, float_quant
from qmann_tpu.ops.attention import (
    INT32_SIGN_BIT, _bit, _common_mode_preprocess, _encode_words,
)

# Default batch tile: sized so the largest scratch (the [TB, O, I] product
# lattice at O, I <= ~128/192) stays well under VMEM while amortizing grid
# overhead.  At the reference's tiny dims, XLA's fusion path outperforms
# these kernels (measured on v5e: ~660k vs ~272k q/s at tile 8), so the
# Pallas backend is opt-in (QmannConfig.use_pallas).
DEFAULT_BATCH_TILE = 32


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Quantized mat-vec:  out[b, o] = Q(sum_i Q(Q(w[o,i]) * Q(x[b,i])))
# ---------------------------------------------------------------------------

def _qmatvec_kernel(w_ref, x_ref, out_ref, acc_ref, *, fmt_w: QFormat,
                    fmt_x: QFormat, n_i: int):
    """Grid (batch, O-blocks, I-blocks), I innermost: quantized partial
    sums accumulate in an f32 VMEM scratch across I-blocks (exact — the
    products live on the 2^-frac grid), the last I-block applies the
    single output re-quantization."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = float_quant(w_ref[:], fmt_w)                 # [TO, TI]
    xq = float_quant(x_ref[:], fmt_x)                 # [TB, TI]
    prod = float_quant(xq[:, None, :] * wq[None, :, :], fmt_w)  # [TB,TO,TI]
    acc_ref[:] += jnp.sum(prod, axis=-1)

    @pl.when(i == n_i - 1)
    def _finish():
        out_ref[:] = float_quant(acc_ref[:], fmt_w)


# lattice size past which qmatvec_pallas auto-tiles O and I (bytes of the
# [TB, O, I] f32 product lattice; VMEM is ~16 MB/core on v5e)
_AUTO_TILE_LATTICE_BYTES = 4 * 1024 * 1024
_DEFAULT_O_TILE = 128
_DEFAULT_I_TILE = 512


def qmatvec_pallas(w: jax.Array, x: jax.Array, fmt_w: QFormat,
                   fmt_x: QFormat, batch_tile: int = DEFAULT_BATCH_TILE,
                   o_tile: int = 0, i_tile: int = 0,
                   interpret: bool = False) -> jax.Array:
    """Pallas forward of ops.qlinear.qmatvec (quantized path, without the
    XNOR binary scale — the caller applies it).  x: [B, I], w: [O, I].

    o_tile/i_tile: 0 = auto (tile only when the whole-feature lattice
    would exceed _AUTO_TILE_LATTICE_BYTES).  Binary formats never pad/tile
    the I axis: their quantizer maps 0 to +1, so zero-padded columns would
    contribute spurious products."""
    B, I = x.shape
    O = w.shape[0]
    tb = min(batch_tile, B)
    lattice = 4 * tb * O * I
    if o_tile == 0:
        o_tile = O if lattice <= _AUTO_TILE_LATTICE_BYTES else min(
            O, _DEFAULT_O_TILE)
    if i_tile == 0:
        i_tile = I if lattice <= _AUTO_TILE_LATTICE_BYTES else min(
            I, _DEFAULT_I_TILE)
    if fmt_w.is_binary or fmt_x.is_binary:
        i_tile = I
    to, ti = min(o_tile, O), min(i_tile, I)
    nb, no, ni = _cdiv(B, tb), _cdiv(O, to), _cdiv(I, ti)
    pad_b, pad_o, pad_i = nb * tb - B, no * to - O, ni * ti - I
    if pad_b or pad_i:
        x = jnp.pad(x, ((0, pad_b), (0, pad_i)))
    if pad_o or pad_i:
        w = jnp.pad(w, ((0, pad_o), (0, pad_i)))
    out = pl.pallas_call(
        functools.partial(_qmatvec_kernel, fmt_w=fmt_w, fmt_x=fmt_x,
                          n_i=ni),
        grid=(nb, no, ni),
        in_specs=[
            pl.BlockSpec((to, ti), lambda b, o, i: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ti), lambda b, o, i: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, to), lambda b, o, i: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, no * to), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, to), jnp.float32)],
        interpret=interpret,
    )(w, x)
    return out[:B, :O]


# ---------------------------------------------------------------------------
# Hamming-similarity attention scores (mode 3 forward)
# ---------------------------------------------------------------------------

def _hamming_score_block(m, u, iwl: int, num_bit: int, const_scale: int,
                         round_mode: int, weight_para: int, weighted: bool):
    """In-register mode-3 score (_cuda_approximate_attention semantics):
    m [TB, M, D] float, u [TB, D] float -> [TB, M] quantized scores at the
    full-width format (iwl, 31-iwl).  Shared by the standalone hamming
    kernel, the fused read, and the whole-chain kernel."""
    fmt_full = QFormat(iwl, 31 - iwl, round_mode)
    wm = _encode_words(m, iwl, round_mode)                  # [TB, M, D] int32
    wu = _encode_words(u, iwl, round_mode)[:, None, :]
    pm, pu = _common_mode_preprocess(wm, wu)
    sim = jnp.zeros(pm.shape, jnp.float32)
    for i in range(1, num_bit):
        match = (_bit(pm, i) == _bit(pu, i)).astype(jnp.float32)
        sim = sim + match * np.float32(2.0 ** (-i - weight_para)
                                       if weighted else 1.0)
    if weighted:
        sign_differs = (pm & INT32_SIGN_BIT) != (pu & INT32_SIGN_BIT)
        sim = jnp.where(sign_differs, -sim, sim)
    term = float_quant(sim * np.float32(2.0 ** const_scale), fmt_full)
    return float_quant(jnp.sum(term, axis=-1), fmt_full)


def _hamming_kernel(m_ref, u_ref, out_ref, *, iwl: int, num_bit: int,
                    const_scale: int, round_mode: int, weight_para: int,
                    weighted: bool):
    out_ref[:] = _hamming_score_block(m_ref[:], u_ref[:], iwl, num_bit,
                                      const_scale, round_mode, weight_para,
                                      weighted)


def hamming_score_pallas(m: jax.Array, u: jax.Array, iwl: int, num_bit: int,
                         const_scale: int = -3, round_mode: int = 3,
                         batch_tile: int = DEFAULT_BATCH_TILE,
                         interpret: bool = False, weight_para: int = 0,
                         weighted: bool = True) -> jax.Array:
    """Pallas forward of ops.attention.hamming_score.
    m: [B, M, D], u: [B, D] -> [B, M]."""
    B, M, D = m.shape
    tb = min(batch_tile, B)
    nb = _cdiv(B, tb)
    pad = nb * tb - B
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad, M, D), m.dtype)])
        u = jnp.concatenate([u, jnp.zeros((pad, D), u.dtype)])
    out = pl.pallas_call(
        functools.partial(_hamming_kernel, iwl=iwl, num_bit=num_bit,
                          const_scale=const_scale, round_mode=round_mode,
                          weight_para=weight_para, weighted=weighted),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, M, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, M), jnp.float32),
        interpret=interpret,
    )(m, u)
    return out[:B]


# ---------------------------------------------------------------------------
# Fused attention read: scores -> masked softmax -> quantized weighted sum
# (one VMEM-resident program per batch tile; the reference runs this as
#  four separate kernels per hop: _cuda_mat_mat_trans_product, _cuda_max,
#  _cuda_softmax_fwd, _cuda_mat_trans_mat_product)
# ---------------------------------------------------------------------------

def _fused_read_kernel(m_ref, c_ref, u_ref, mask_ref, o_ref, p_ref,
                       s_ref, *,
                       fmt_att: QFormat, fmt_bin: QFormat, fmt_act: QFormat,
                       score_quantized: bool, sum_quantized: bool,
                       attention_mode: int = 2, ham_num_bit: int = 8,
                       ham_const_scale: int = -3, ham_weight_para: int = 0,
                       ham_weighted: bool = True):
    m = m_ref[:]                                     # [TB, M, D]
    c = c_ref[:]
    u = u_ref[:]                                     # [TB, D]
    mask = mask_ref[:] != 0                          # [TB, M]
    # minor-dim expansion must happen on the 32-bit mask (Mosaic cannot
    # reshape i1 vectors into a new minor dim)
    mask_f3 = mask_ref[:].astype(jnp.float32)[:, :, None]   # [TB, M, 1]

    # scores (mode 2: per-product requant to fmt_att, row-sum requant;
    # mode-2 scores are quantized regardless of EN_FIXED_POINT —
    # ops.attention.attention_score:231-232.  mode 3: the Hamming
    # bit-lattice on the RAW operands at the full-width format,
    # cuda_dot_mat_vec_fwd_appx, lib/layer_cuda.cu:2491-2557)
    if attention_mode == 3:
        scores = _hamming_score_block(m, u, fmt_att.iwl, ham_num_bit,
                                      ham_const_scale, fmt_att.mode,
                                      ham_weight_para, ham_weighted)
    elif score_quantized:
        prod = float_quant(
            float_quant(m, fmt_att) * float_quant(u, fmt_bin)[:, None, :],
            fmt_att)
        scores = float_quant(jnp.sum(prod, axis=-1), fmt_att)
    else:
        scores = jnp.einsum("bmd,bd->bm", m, u,
                            preferred_element_type=jnp.float32)
    s_ref[:] = scores

    # masked softmax (max-subtracted exp; lib/layer_cuda.cu:1969-2060)
    neg = np.float32(-1e30)
    s = jnp.where(mask, scores, neg)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(s - mx), 0.0)
    total = jnp.sum(e, axis=-1, keepdims=True)
    total = jnp.where(total == 0.0, 1.0, total)
    p = e / total
    p_ref[:] = p

    # quantized weighted sum (per-product requant to fmt_act)
    if sum_quantized:
        prod2 = float_quant(
            float_quant(p, fmt_act)[:, :, None] * float_quant(c, fmt_act),
            fmt_act)
        prod2 = prod2 * mask_f3
        o_ref[:] = float_quant(jnp.sum(prod2, axis=1), fmt_act)
    else:
        o_ref[:] = jnp.sum(c * (p * mask.astype(jnp.float32))[:, :, None],
                           axis=1)


def _fused_chain_kernel(flat_ref, u_ref, h_ref, mask_ref,
                        u_out_ref, p_ref, s_ref, *,
                        fmts_w, fmts_att, fmt_bin, fmts_act, n_hops: int,
                        linear_mapping: bool, non_linearity: bool,
                        attention_mode: int = 2, ham_num_bit: int = 8,
                        ham_const_scale: int = -3, ham_weight_para: int = 0,
                        ham_weighted: bool = True):
    """The WHOLE K-hop controller chain in one VMEM-resident program.

    flat: [TB, M, 2K*D] — the stacked embedding MXU matmul output, RAW
    (pre-requant); the per-hop-format requants happen in-register here,
    replacing the 2K XLA slice+requant fusions.  u: [TB, D] query
    embedding (already quantized at fmt_w[0]).  h: [K, D, D] raw lin_map
    weights.  Per hop h (EN_FIXED_POINT semantics — bit-identical
    to models.memn2n._hop_stack's unfused op chain):
      score  = Q(sum_d Q(Q(m,att)*Q(u,bin), att), att)      (qscore, mode 2)
               or the Hamming bit-lattice on the RAW m/u at the
               full-width format (mode 3, _hamming_score_block)
      p      = masked softmax(score)                        (ops.softmax)
      o      = Q(sum_m mask*Q(Q(p,act)*Q(c,act), act), act) (qweighted_sum)
      u_map  = Q(sum_i Q(Q(H,w)*Q(u,bin), w), w)            (qmatvec)
      u      = Q(Q(u_map,act)+Q(o,act), act)                (qsum)
      [+ ReLU requant when EN_NON_LINEARITY]
    """
    flat = flat_ref[:]                               # [TB, M, 2K*D]
    u = u_ref[:]                                     # [TB, D]
    mask = mask_ref[:] != 0                          # [TB, M]
    mask_f3 = mask_ref[:].astype(jnp.float32)[:, :, None]
    neg = np.float32(-1e30)
    D = u.shape[-1]
    K = n_hops
    for h in range(K):
        fmt_w, fmt_att, fmt_act = fmts_w[h], fmts_att[h], fmts_act[h]
        m = float_quant(flat[:, :, h * D:(h + 1) * D], fmt_w)
        c = float_quant(flat[:, :, (K + h) * D:(K + h + 1) * D], fmt_w)
        uq_bin = float_quant(u, fmt_bin)
        # score
        if attention_mode == 3:
            scores = _hamming_score_block(
                m, u, fmt_att.iwl, ham_num_bit, ham_const_scale,
                fmt_att.mode, ham_weight_para, ham_weighted)    # [TB, M]
        else:
            prod = float_quant(
                float_quant(m, fmt_att) * uq_bin[:, None, :], fmt_att)
            scores = float_quant(jnp.sum(prod, axis=-1), fmt_att)  # [TB, M]
        s_ref[:, h, :] = scores
        # masked softmax (ops.softmax._masked_exp_parts semantics)
        sm = jnp.where(mask, scores, neg)
        mx = jnp.max(sm, axis=-1, keepdims=True)
        e = jnp.where(mask, jnp.exp(sm - mx), 0.0)
        total = jnp.sum(e, axis=-1, keepdims=True)
        total = jnp.where(total == 0.0, 1.0, total)
        p = e / total
        p_ref[:, h, :] = p
        # qweighted_sum
        prod2 = float_quant(
            float_quant(p, fmt_act)[:, :, None] * float_quant(c, fmt_act),
            fmt_act)
        o = float_quant(jnp.sum(prod2 * mask_f3, axis=1), fmt_act)
        # lin_map (qmatvec slow-path lattice, [TB, D, D] in VMEM)
        if linear_mapping:
            wq = float_quant(h_ref[h], fmt_w)                   # [D, D]
            wp = float_quant(wq[None, :, :] * uq_bin[:, None, :], fmt_w)
            u_m = float_quant(jnp.sum(wp, axis=-1), fmt_w)
        else:
            u_m = u
        # qsum residual
        u = float_quant(
            float_quant(u_m, fmt_act) + float_quant(o, fmt_act), fmt_act)
        if non_linearity:
            u = float_quant(jnp.maximum(u, 0.0), fmt_act)
    u_out_ref[:] = u


# batch tile for the chain kernel: the limiter is SCOPED vmem — the K
# unrolled hops each materialize [TB, D, D] lin_map-lattice temporaries
# (wq*u products + their requant intermediates), and Mosaic stack-
# allocates them together.  Measured on v5e (round 4): TB=200 at the
# reference dims (K=3, D=60, M=10) needs 17.78 MB scoped vmem against
# the 16 MB/core budget — i.e. ~4*TB*(M*2K*D + ~5.2*D^2) bytes.
# DEFAULT_CHAIN_TILE = 0 auto-sizes the tile from that model against a
# conservative 12 MB budget (TB=112 at the reference dims).
DEFAULT_CHAIN_TILE = 0
_CHAIN_VMEM_BUDGET = 12e6


def _auto_chain_tile(m: int, kd2: int, d: int) -> int:
    per_row = 4.0 * (m * kd2 + 6.0 * d * d)
    return max(8, int(_CHAIN_VMEM_BUDGET / per_row) // 8 * 8)


def fused_hop_chain_pallas(flat: jax.Array, u: jax.Array,
                           hmats: jax.Array, mask: jax.Array,
                           fmts_w, fmts_att, fmt_bin, fmts_act,
                           linear_mapping: bool = True,
                           non_linearity: bool = False,
                           batch_tile: int = 0,
                           interpret: bool = False,
                           attention_mode: int = 2,
                           ham_num_bit: int = 8,
                           ham_const_scale: int = -3,
                           ham_weight_para: int = 0,
                           ham_weighted: bool = True):
    """One Pallas program for the whole K-hop chain (mode 2/3, quantized).

    flat: [B, M, 2K*D] raw stacked-embedding matmul output; u: [B, D];
    hmats: [K, D, D] (pass zeros with linear_mapping=False); mask: [B, M]
    -> (u_final [B, D], p [K, B, M], scores [K, B, M]).

    Replaces the ~15 serial XLA fusions + 2K slice/requant ops of the
    unfused hop chain (docs/PROFILE_r3.md: together ~316us of the
    ~840us/batch scan budget) with ONE kernel launch per batch tile.
    Forward-only: serving/bench path (models.memn2n.forward_prepared),
    training keeps the differentiable op chain.
    """
    B, M, KD2 = flat.shape
    K = hmats.shape[0]
    D = u.shape[-1]
    assert KD2 == 2 * K * D
    tb = min(batch_tile or DEFAULT_CHAIN_TILE
             or _auto_chain_tile(M, KD2, D), B)
    nb = _cdiv(B, tb)
    pad = nb * tb - B
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, M, KD2), flat.dtype)])
        u = jnp.concatenate([u, jnp.zeros((pad, D), u.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, M), mask.dtype)])
    u_out, p, s = pl.pallas_call(
        functools.partial(_fused_chain_kernel, fmts_w=tuple(fmts_w),
                          fmts_att=tuple(fmts_att), fmt_bin=fmt_bin,
                          fmts_act=tuple(fmts_act), n_hops=K,
                          linear_mapping=linear_mapping,
                          non_linearity=non_linearity,
                          attention_mode=attention_mode,
                          ham_num_bit=ham_num_bit,
                          ham_const_scale=ham_const_scale,
                          ham_weight_para=ham_weight_para,
                          ham_weighted=ham_weighted),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, M, KD2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, K, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, K, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * tb, D), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, K, M), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, K, M), jnp.float32),
        ),
        interpret=interpret,
    )(flat, u, hmats, mask.astype(jnp.int32))
    return (u_out[:B], jnp.swapaxes(p[:B], 0, 1),
            jnp.swapaxes(s[:B], 0, 1))


def fused_attention_read_pallas(m: jax.Array, c: jax.Array, u: jax.Array,
                                mask: jax.Array, fmt_att: QFormat,
                                fmt_bin: QFormat, fmt_act: QFormat,
                                score_quantized: bool = True,
                                sum_quantized: bool = True,
                                batch_tile: int = DEFAULT_BATCH_TILE,
                                interpret: bool = False,
                                attention_mode: int = 2,
                                ham_num_bit: int = 8,
                                ham_const_scale: int = -3,
                                ham_weight_para: int = 0,
                                ham_weighted: bool = True):
    """One-program attention read for modes 1/2/3.
    m, c: [B, M, D]; u: [B, D]; mask: [B, M]
    -> (o [B, D], p [B, M], scores [B, M])."""
    B, M, D = m.shape
    tb = min(batch_tile, B)
    nb = _cdiv(B, tb)
    pad = nb * tb - B
    if pad:
        z3 = jnp.zeros((pad, M, D), m.dtype)
        m = jnp.concatenate([m, z3])
        c = jnp.concatenate([c, z3])
        u = jnp.concatenate([u, jnp.zeros((pad, D), u.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, M), mask.dtype)])
    o, p, s = pl.pallas_call(
        functools.partial(_fused_read_kernel, fmt_att=fmt_att,
                          fmt_bin=fmt_bin, fmt_act=fmt_act,
                          score_quantized=score_quantized,
                          sum_quantized=sum_quantized,
                          attention_mode=attention_mode,
                          ham_num_bit=ham_num_bit,
                          ham_const_scale=ham_const_scale,
                          ham_weight_para=ham_weight_para,
                          ham_weighted=ham_weighted),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, M, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, M, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * tb, D), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, M), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, M), jnp.float32),
        ),
        interpret=interpret,
    )(m, c, u, mask.astype(jnp.int32))
    return o[:B], p[:B], s[:B]
