"""End-to-end model wiring oracle: an independent numpy implementation of
the reference's per-sample forward pass (SURVEY.md section 3.2 call stack)
built from the already-oracle-tested primitives, compared bit-for-bit
against models.memn2n.forward.

This catches wiring mistakes the op-level tests cannot: which Q-format
feeds which operand of which layer (emb_q both-fmt_w[0]; dense_mat single
fmt_w[h]; attention (fmt_att, fmt_bin) with output fmt_att; weighted sum
and residual fmt_act[h]; lin_map (in fmt_bin, w fmt_w[h]); float output
layer), the EN_MQ per-hop weight formats, and the hop recurrence
u_{h+1} = Q(Q(H u_h) + Q(o_h)).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qmann_tpu.config import QmannConfig
from qmann_tpu.data import DataDims
from qmann_tpu.models import memn2n
from test_numerics import oracle_quant


def oq(x, fmt):
    return oracle_quant(np.float32(x), fmt.iwl, fmt.frac)


def oracle_qmatvec(w, x, fmt_w, fmt_x):
    """_cuda_mat_vec_product (lib/layer_cuda.cu:49-83)."""
    O, I = w.shape
    out = np.zeros(O, np.float32)
    for o in range(O):
        s = np.float32(0.0)
        for i in range(I):
            s += oq(np.float32(oq(w[o, i], fmt_w) * oq(x[i], fmt_x)), fmt_w)
        out[o] = oq(s, fmt_w)
    return out


def oracle_forward_sample(params, mem, que, n_sen, cfg: QmannConfig):
    """One sample through the reference flow (MemN2N/MemN2N.c:1372-1532)."""
    fmt_w, fmt_act, fmt_att = cfg.fmt_w, cfg.fmt_act, cfg.fmt_att
    fmt_bin = cfg.fmt_bin
    A, C, B, H, W = (np.asarray(params[k]) for k in "ACBHW")

    u = oracle_qmatvec(B, que, fmt_w[0], fmt_w[0])
    for h in range(cfg.num_hops):
        # dense_mat: M = S A^T, single format fmt_w[h] (cuda_dense_mat_fwd)
        m = np.stack([oracle_qmatvec(A, mem[i], fmt_w[h], fmt_w[h])
                      for i in range(n_sen)])
        c = np.stack([oracle_qmatvec(C, mem[i], fmt_w[h], fmt_w[h])
                      for i in range(n_sen)])
        # attention mode 2: per-product Q(Q(m,att)*Q(u,bin), att), row sums
        # re-quantized at att (cuda_dot_mat_vec_fwd, lib/layer_cuda.cu:2438)
        scores = np.zeros(n_sen, np.float32)
        for i in range(n_sen):
            s = np.float32(0.0)
            for j in range(cfg.dim_emb):
                s += oq(np.float32(oq(m[i, j], fmt_att[h]) *
                                   oq(u[j], fmt_bin)), fmt_att[h])
            scores[i] = oq(s, fmt_att[h])
        # softmax over the live rows (cuda_softmax_fwd)
        e = np.exp(scores - scores.max())
        p = (e / e.sum()).astype(np.float32)
        # weighted sum: o = C^T p, single fmt_act[h], first operand p
        # (_cuda_mat_trans_mat_product, lib/layer_cuda.cu:547-573)
        o = np.zeros(cfg.dim_emb, np.float32)
        for j in range(cfg.dim_emb):
            s = np.float32(0.0)
            for i in range(n_sen):
                s += oq(np.float32(oq(p[i], fmt_act[h]) *
                                   oq(c[i, j], fmt_act[h])), fmt_act[h])
            o[j] = oq(s, fmt_act[h])
        # lin_map: in fmt_bin, weights fmt_w[h] (MemN2N/MemN2N.c:860)
        um = oracle_qmatvec(H, u, fmt_w[h], fmt_bin)
        # sum_vec at fmt_act[h]
        u = np.array([oq(np.float32(oq(um[j], fmt_act[h]) +
                                    oq(o[j], fmt_act[h])), fmt_act[h])
                      for j in range(cfg.dim_emb)], np.float32)
    # ds_ans: float (f_fixed=false)
    return W.astype(np.float32) @ u


@pytest.mark.parametrize("en_mq", [True, False])
def test_full_forward_matches_reference_call_stack(rng, en_mq):
    cfg = QmannConfig(dim_emb=6, num_hops=3, verbose=False, en_mq=en_mq)
    dims = DataDims(dim_dict=9, max_line=4, max_word=4, dim_word=5,
                    dim_input=13)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(1))
    # scale weights up so quantization actually bites at Q5.2/Q6.1
    params = {k: v * 8.0 for k, v in params.items()}

    B = 3
    mem = rng.integers(0, 3, (B, 4, 13)).astype(np.float32)
    que = rng.integers(0, 3, (B, 13)).astype(np.float32)
    n_sen = np.array([4, 2, 3])
    mask = np.arange(4)[None, :] < n_sen[:, None]
    mem *= mask[:, :, None]

    out = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                         jnp.asarray(mask), cfg)
    got = np.asarray(out.logits)
    for b in range(B):
        want = oracle_forward_sample(params, mem[b], que[b], int(n_sen[b]),
                                     cfg)
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"sample {b} en_mq={en_mq}")
