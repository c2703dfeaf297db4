"""Pallas kernels vs the jnp reference implementations (interpret mode on
CPU; the same kernels compile for TPU — exercised by bench/serving)."""
import numpy as np
import pytest
import jax.numpy as jnp

from qmann_tpu.numerics import QFormat, float_quant
from qmann_tpu.ops import qmatvec, hamming_score, qscore, qweighted_sum, softmax
from qmann_tpu.ops.pallas.qkernels import (
    fused_attention_read_pallas, hamming_score_pallas, qmatvec_pallas,
)


@pytest.mark.parametrize("iwl", [2, 5])
def test_qmatvec_pallas_matches_jnp(rng, iwl):
    fmt_w = QFormat(iwl, 7 - iwl)
    fmt_x = QFormat(2, 5)
    w = jnp.asarray(rng.normal(0, 1.5, (13, 21)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1.5, (19, 21)).astype(np.float32))
    got = qmatvec_pallas(w, x, fmt_w, fmt_x, interpret=True)
    want = qmatvec(w, x, fmt_w, fmt_x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("iwl", [0, 1, 5])
def test_hamming_pallas_matches_jnp(rng, iwl):
    act = QFormat(iwl, 7 - iwl)
    m = float_quant(jnp.asarray(rng.normal(0, 2, (11, 6, 5)).astype(np.float32)), act)
    u = float_quant(jnp.asarray(rng.normal(0, 2, (11, 5)).astype(np.float32)), act)
    got = hamming_score_pallas(m, u, iwl, 8, interpret=True)
    want = hamming_score(m, u, iwl, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("weight_para,weighted", [(-1, True), (0, False)])
def test_hamming_pallas_variants_match_jnp(rng, weight_para, weighted):
    """HAMMING_WEIGHT_PARA / unweighted variants agree across backends."""
    iwl = 2
    act = QFormat(iwl, 7 - iwl)
    m = float_quant(jnp.asarray(rng.normal(0, 2, (9, 6, 5)).astype(np.float32)), act)
    u = float_quant(jnp.asarray(rng.normal(0, 2, (9, 5)).astype(np.float32)), act)
    got = hamming_score_pallas(m, u, iwl, 8, interpret=True,
                               weight_para=weight_para, weighted=weighted)
    want = hamming_score(m, u, iwl, 8, -3, 3, "jnp", weight_para, weighted)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("quantized", [True, False])
def test_fused_attention_read_matches_composition(rng, quantized):
    fmt = QFormat(5, 2)
    B, M, D = 7, 6, 10
    m = jnp.asarray(rng.normal(0, 1, (B, M, D)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 1, (B, M, D)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))
    n_sen = rng.integers(1, M + 1, B)
    mask = jnp.asarray(np.arange(M)[None, :] < n_sen[:, None])

    o, p, s = fused_attention_read_pallas(m, c, u, mask, fmt, fmt, fmt,
                                          score_quantized=quantized,
                                          sum_quantized=quantized,
                                          interpret=True)
    scores = qscore(m, u, fmt, fmt, quantized=quantized)
    p_ref = softmax(scores, mask)
    o_ref = qweighted_sum(c, p_ref, mask.astype(jnp.float32), fmt,
                          quantized=quantized)
    np.testing.assert_allclose(np.asarray(s), np.asarray(scores),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-6, atol=1e-7)
    if quantized:
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o_ref))
    else:
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=1e-5, atol=1e-6)


def test_fused_attention_read_mode3_matches_composition(rng):
    """Mode-3 fused read: in-kernel Hamming bit-lattice -> masked softmax
    -> quantized weighted sum must equal the unfused composition
    bit-for-bit."""
    fmt = QFormat(2, 5)
    B, M, D = 7, 6, 10
    m = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, M, D)).astype(np.float32)), fmt)
    c = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, M, D)).astype(np.float32)), fmt)
    u = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, D)).astype(np.float32)), fmt)
    n_sen = rng.integers(1, M + 1, B)
    mask = jnp.asarray(np.arange(M)[None, :] < n_sen[:, None])

    o, p, s = fused_attention_read_pallas(
        m, c, u, mask, fmt, fmt, fmt, interpret=True,
        attention_mode=3, ham_num_bit=8)
    scores = hamming_score(m, u, fmt.iwl, 8)
    p_ref = softmax(scores, mask)
    o_ref = qweighted_sum(c, p_ref, mask.astype(jnp.float32), fmt,
                          quantized=True)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(scores))
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(o_ref))


@pytest.mark.parametrize("sum_gq", [False, True])
def test_fused_attention_read_mode3_gradients_match_surrogate(rng, sum_gq):
    """Mode-3 fused read VJP must equal the unfused chain's gradients —
    the reference's hand-crafted Hamming surrogate through the softmax
    backward, with the weighted-sum backward in BOTH branches: float and
    the quantized contractions (sum_grad_quantized — what the model
    passes for fixed-point mode 3)."""
    import jax
    from qmann_tpu.ops.fused import fused_attention_read
    fmt = QFormat(2, 5)
    B, M, D = 5, 6, 8
    m = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, M, D)).astype(np.float32)), fmt)
    c = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, M, D)).astype(np.float32)), fmt)
    u = float_quant(jnp.asarray(
        rng.normal(0, 1.5, (B, D)).astype(np.float32)), fmt)
    g = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))
    n_sen = rng.integers(1, M + 1, B)
    mask = np.arange(M)[None, :] < n_sen[:, None]
    mask_f = jnp.asarray(mask, jnp.float32)

    def f_fused(m_, c_, u_):
        o, _, _ = fused_attention_read(m_, c_, u_, mask_f, fmt, fmt, fmt,
                                       interpret=True, attention_mode=3,
                                       ham_num_bit=8,
                                       sum_grad_quantized=sum_gq)
        return jnp.sum(o * g)

    def f_ref(m_, c_, u_):
        scores = hamming_score(m_, u_, fmt.iwl, 8)
        p = softmax(scores, jnp.asarray(mask))
        o = qweighted_sum(c_, p, mask_f, fmt, quantized=True,
                          grad_quantized=sum_gq)
        return jnp.sum(o * g)

    got = jax.grad(f_fused, argnums=(0, 1, 2))(m, c, u)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(m, c, u)
    for a, b, name in zip(got, want, ("dm", "dc", "du")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_model_forward_pallas_hamming_only_matches_jnp(rng):
    """use_pallas_hamming routes JUST the mode-3 score through the Pallas
    kernel — forward must stay bit-identical to the pure-jnp path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data import DataDims
    from qmann_tpu.models import memn2n

    cfg = QmannConfig(dim_emb=8, num_hops=2, verbose=False,
                      attention_mode=3)
    dims = DataDims(dim_dict=12, max_line=5, max_word=5, dim_word=6,
                    dim_input=17)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))
    mem = rng.integers(0, 2, (6, 5, 17)).astype(np.float32)
    que = rng.integers(0, 2, (6, 17)).astype(np.float32)
    n_sen = rng.integers(1, 6, 6)
    mask = np.arange(5)[None, :] < n_sen[:, None]
    mem = mem * mask[:, :, None]
    out_ref = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                             jnp.asarray(mask), cfg)
    with pltpu.force_tpu_interpret_mode():
        out_pl = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                                jnp.asarray(mask),
                                cfg.replace(use_pallas_hamming=True))
    np.testing.assert_array_equal(np.asarray(out_pl.logits),
                                  np.asarray(out_ref.logits))
    np.testing.assert_array_equal(np.asarray(out_pl.scores),
                                  np.asarray(out_ref.scores))


def test_model_forward_pallas_backend_matches_jnp(rng):
    """The whole model forward with use_pallas must match the jnp backend
    bit-for-bit (interpret mode on CPU)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data import DataDims
    from qmann_tpu.models import memn2n

    for mode in (2, 3):
        cfg = QmannConfig(dim_emb=8, num_hops=2, verbose=False,
                          attention_mode=mode)
        dims = DataDims(dim_dict=12, max_line=5, max_word=5, dim_word=6,
                        dim_input=17)
        params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))
        mem = rng.integers(0, 2, (6, 5, 17)).astype(np.float32)
        que = rng.integers(0, 2, (6, 17)).astype(np.float32)
        n_sen = rng.integers(1, 6, 6)
        mask = np.arange(5)[None, :] < n_sen[:, None]
        mem = mem * mask[:, :, None]
        out_ref = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                                 jnp.asarray(mask), cfg)
        with pltpu.force_tpu_interpret_mode():
            out_pl = memn2n.forward(params, jnp.asarray(mem),
                                    jnp.asarray(que), jnp.asarray(mask),
                                    cfg.replace(use_pallas=True))
        np.testing.assert_array_equal(np.asarray(out_pl.logits),
                                      np.asarray(out_ref.logits),
                                      err_msg=f"mode {mode}")


@pytest.mark.parametrize("o_tile,i_tile", [(8, 8), (8, 16), (128, 512)])
def test_qmatvec_pallas_tiled_matches_jnp(rng, o_tile, i_tile):
    """O/I tiling with the f32 VMEM accumulator (VMEM-exceeding configs)
    must stay bit-identical — including non-dividing tile edges."""
    fmt_w = QFormat(5, 2)
    fmt_x = QFormat(2, 5)
    w = jnp.asarray(rng.normal(0, 1.5, (29, 37)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1.5, (19, 37)).astype(np.float32))
    got = qmatvec_pallas(w, x, fmt_w, fmt_x, o_tile=o_tile, i_tile=i_tile,
                         interpret=True)
    want = qmatvec(w, x, fmt_w, fmt_x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_qmatvec_pallas_binary_format_never_pads_i(rng):
    """Binary formats quantize 0 -> +1, so the I axis must not be padded
    or tiled; outputs must match the jnp binary path exactly."""
    fmt_w = QFormat(0, 0)
    fmt_x = QFormat(2, 5)
    w = jnp.asarray(rng.normal(0, 1.5, (13, 21)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1.5, (9, 21)).astype(np.float32))
    got = qmatvec_pallas(w, x, fmt_w, fmt_x, i_tile=8, interpret=True)
    prod = float_quant(float_quant(w, fmt_w) * float_quant(
        x[:, None, :], fmt_x), fmt_w)
    want = float_quant(jnp.sum(prod, axis=-1), fmt_w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("quantized", [True, False])
def test_fused_attention_read_op_gradients_match_composition(rng, quantized):
    """The fused op's custom VJP must equal the unfused chain's gradients
    (raw-float reference backward through score/softmax/weighted-sum)."""
    import jax
    from qmann_tpu.ops.fused import fused_attention_read
    fmt = QFormat(5, 2)
    B, M, D = 5, 6, 8
    m = jnp.asarray(rng.normal(0, 1, (B, M, D)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 1, (B, M, D)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))
    n_sen = rng.integers(1, M + 1, B)
    mask = np.arange(M)[None, :] < n_sen[:, None]
    mask_f = jnp.asarray(mask, jnp.float32)

    def f_fused(m_, c_, u_):
        o, _, _ = fused_attention_read(m_, c_, u_, mask_f, fmt, fmt, fmt,
                                       score_quantized=quantized,
                                       sum_quantized=quantized,
                                       interpret=True)
        return jnp.sum(o * g)

    def f_ref(m_, c_, u_):
        scores = qscore(m_, u_, fmt, fmt, quantized=quantized)
        p = softmax(scores, jnp.asarray(mask))
        o = qweighted_sum(c_, p, mask_f, fmt, quantized=quantized)
        return jnp.sum(o * g)

    got = jax.grad(f_fused, argnums=(0, 1, 2))(m, c, u)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(m, c, u)
    for a, b, name in zip(got, want, ("dm", "dc", "du")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("tying,linmap,relu,att_mode",
                         [(2, True, False, 2),
                          (2, False, True, 2),
                          (1, True, False, 2),
                          (2, True, False, 3),   # Hamming in-chain
                          (1, False, False, 3)])
def test_fused_hop_chain_matches_unfused_prepared(rng, tying, linmap, relu,
                                                  att_mode):
    """forward_prepared with use_fused_chain (the whole K-hop controller
    loop as ONE Pallas program, consuming the RAW stacked-embedding matmul
    output) must be bit-identical to the regular forward — logits,
    attention probabilities, and raw scores — across tying schemes,
    lin_map on/off, ReLU on/off, EN_MQ per-hop formats, and partial
    masks."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data import DataDims
    from qmann_tpu.models import memn2n

    cfg = QmannConfig(dim_emb=8, num_hops=3, verbose=False,
                      type_weight_tying=tying, attention_mode=att_mode,
                      en_linear_mapping=linmap, en_non_linearity=relu)
    dims = DataDims(dim_dict=12, max_line=5, max_word=5, dim_word=6,
                    dim_input=17)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(1))
    # scale weights so quantized values are non-degenerate at Q5.2
    params = {k: v * 6.0 for k, v in params.items()}
    B = 7  # not a multiple of the batch tile: exercises padding
    mem = rng.integers(0, 3, (B, 5, 17)).astype(np.float32)
    que = rng.integers(0, 3, (B, 17)).astype(np.float32)
    n_sen = rng.integers(1, 6, B)
    mask = np.arange(5)[None, :] < n_sen[:, None]
    mem = mem * mask[:, :, None]

    out_ref = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                             jnp.asarray(mask), cfg)
    ccfg = cfg.replace(use_fused_chain=True)
    prep = memn2n.prepare_inference(
        params, ccfg, max_count=float(dims.max_word + 1),
        max_rowsum=float(dims.max_word + 1))
    assert prep.fast, "prepared fast path must engage for this case"
    with pltpu.force_tpu_interpret_mode():
        out_ch = memn2n.forward_prepared(prep, jnp.asarray(mem),
                                         jnp.asarray(que),
                                         jnp.asarray(mask), ccfg)
    np.testing.assert_array_equal(np.asarray(out_ch.logits),
                                  np.asarray(out_ref.logits))
    np.testing.assert_array_equal(np.asarray(out_ch.scores),
                                  np.asarray(out_ref.scores))
    np.testing.assert_array_equal(np.asarray(out_ch.attention),
                                  np.asarray(out_ref.attention))


def test_fused_chain_guard_falls_back(rng):
    """Configs outside the chain's envelope (float mode 1, score mods,
    feature heads) must silently keep the unfused prepared path.  (Mode 3
    now TAKES the chain route — covered by
    test_fused_hop_chain_matches_unfused_prepared.)"""
    import jax
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data import DataDims
    from qmann_tpu.models import memn2n

    dims = DataDims(dim_dict=12, max_line=5, max_word=5, dim_word=6,
                    dim_input=17)
    mem = rng.integers(0, 2, (4, 5, 17)).astype(np.float32)
    que = rng.integers(0, 2, (4, 17)).astype(np.float32)
    mask = np.ones((4, 5), bool)
    for extra in (dict(attention_mode=1), dict(en_att_shift=True),
                  dict(en_sc_att=True)):
        cfg = QmannConfig(dim_emb=8, num_hops=2, verbose=False,
                          use_fused_chain=True, **extra)
        params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))
        prep = memn2n.prepare_inference(params, cfg)
        out = memn2n.forward_prepared(prep, jnp.asarray(mem),
                                      jnp.asarray(que), jnp.asarray(mask),
                                      cfg)  # no interpret ctx: must not
        ref = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                             jnp.asarray(mask), cfg)  # reach pallas_call
        np.testing.assert_array_equal(np.asarray(out.logits),
                                      np.asarray(ref.logits))


def test_auto_chain_tile_fits_vmem_model():
    """The auto tile honors the measured scoped-vmem model: at the
    reference dims it must stay below the TB=200 point that measured
    17.78MB > 16MB on v5e, and it never collapses below the 8-row
    minimum at large dims."""
    from qmann_tpu.ops.pallas.qkernels import _auto_chain_tile

    ref = _auto_chain_tile(10, 360, 60)           # qa1 flagship dims
    assert 8 <= ref < 200 and ref % 8 == 0
    # measured model: ~4*TB*(M*2KD + 5.2*D^2) bytes; the chosen tile must
    # keep the conservative 6*D^2 estimate under the 12MB budget
    assert 4.0 * ref * (10 * 360 + 6.0 * 60 * 60) <= 12e6
    big = _auto_chain_tile(100, 2 * 3 * 512, 512)  # D=512 serving config
    assert big >= 8 and big % 8 == 0
    assert 4.0 * big * (100 * 3072 + 6.0 * 512 * 512) <= 12e6 or big == 8
