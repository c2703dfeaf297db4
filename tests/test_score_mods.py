"""Opt-in saturation-collapse mitigations (qscore score_mod).

The collapse mechanism (BENCH.md): as the query-embedding norm grows,
attention score sums pin at the Q-format bound, softmax degenerates over
the tied rows, and accuracy collapses.  score_mod="shift" subtracts the
row max of the RAW product sums before the output requant — softmax is
shift-invariant, so the score distribution's shape survives quantization
instead of saturating.  These tests pin down:

  * forward semantics of "shift"/"clip" against hand-built references;
  * ordering preservation exactly where the plain requant ties;
  * gradient INVARIANCE: all score_mods share the raw-float surrogate
    backward (lib/layer_cuda.cu:2597-2609), so training differs only
    through the forward scores;
  * the memory-bank-sharded path's global-max shift == single device;
  * model-level wiring (cfg.en_att_shift / en_att_clip).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qmann_tpu.config import QmannConfig
from qmann_tpu.data import DataDims
from qmann_tpu.models import memn2n
from qmann_tpu.numerics import QFormat, fixed_max_float, float_quant
from qmann_tpu.ops import qscore, softmax, qweighted_sum
from qmann_tpu.parallel import make_mesh, memory_sharded_attention_read

FMT = QFormat(5, 2, 3)  # Q5.2 trunc — the flagship format


def _raw_sums(m, u, fmt_m, fmt_u):
    prod = float_quant(
        float_quant(jnp.asarray(m), fmt_m)
        * float_quant(jnp.asarray(u)[..., None, :], fmt_u), fmt_m)
    return jnp.sum(prod, axis=-1)


@pytest.fixture
def saturating_case(rng):
    """Scores whose raw sums exceed the Q5.2 bound (31.75) with distinct
    per-row values — the collapse regime where the plain requant ties."""
    B, M, D = 4, 10, 60
    m = rng.normal(0, 1.2, (B, M, D)).astype(np.float32)
    u = (4.0 * np.abs(rng.normal(0, 1.0, (B, D)))).astype(np.float32)
    m[:, :6] = np.abs(m[:, :6]) * (1.0 + 0.2 * np.arange(6)[None, :, None])
    return m, u


def test_shift_matches_reference_formula(saturating_case):
    m, u = saturating_case
    raw = _raw_sums(m, u, FMT, FMT)
    expect = float_quant(raw - jnp.max(raw, axis=-1, keepdims=True), FMT)
    got = qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT,
                 quantized=True, score_mod="shift")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_clip_matches_reference_formula(saturating_case):
    m, u = saturating_case
    raw = _raw_sums(m, u, FMT, FMT)
    bound = fixed_max_float(FMT.iwl, FMT.frac) - 2.0 ** (-FMT.frac)
    expect = float_quant(jnp.clip(raw, -bound, bound), FMT)
    got = qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT,
                 quantized=True, score_mod="clip")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_shift_preserves_ordering_where_plain_ties(saturating_case):
    m, u = saturating_case
    raw = np.asarray(_raw_sums(m, u, FMT, FMT))
    maxf = float(fixed_max_float(FMT.iwl, FMT.frac))
    plain = np.asarray(qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT,
                              quantized=True))
    shifted = np.asarray(qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT,
                                quantized=True, score_mod="shift"))
    saturated = raw >= maxf
    # the regime is real: several rows per batch pin at the bound...
    assert saturated.sum(axis=-1).min() >= 2
    step = 2.0 ** (-FMT.frac)
    for b in range(raw.shape[0]):
        sat = np.flatnonzero(saturated[b])
        # ...plain requant ties them all at maxf
        assert np.all(plain[b, sat] == maxf)
        # ...while the shift keeps any >= one-step raw separations ordered
        # within the representable window below the row max (rows further
        # than maxf below it saturate at the NEGATIVE bound by design —
        # softmax treats them as negligible either way)
        window = raw[b].max() - maxf + step
        for i in sat:
            for j in sat:
                if raw[b, i] >= raw[b, j] + step and raw[b, j] > window:
                    assert shifted[b, i] > shifted[b, j]


def test_score_mods_share_the_raw_float_gradient(saturating_case):
    """All score_mods use the reference surrogate backward — bitwise."""
    m, u = saturating_case
    g = np.random.default_rng(1).normal(
        0, 1, (m.shape[0], m.shape[1])).astype(np.float32)

    def grads(mod):
        def f(m_, u_):
            s = qscore(m_, u_, FMT, FMT, quantized=True, score_mod=mod)
            return jnp.sum(s * jnp.asarray(g))
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(m), jnp.asarray(u))

    dm0, du0 = grads("none")
    for mod in ("shift", "clip"):
        dm, du = grads(mod)
        np.testing.assert_array_equal(np.asarray(dm), np.asarray(dm0))
        np.testing.assert_array_equal(np.asarray(du), np.asarray(du0))


def test_scores_in_range_shift_is_pure_shift(rng):
    """Within-range scores: shift changes values by a constant per row
    (no extra quantization error beyond the grid), so the softmax over
    them matches the unshifted softmax."""
    B, M, D = 4, 8, 16
    m = (0.25 * rng.integers(-8, 8, (B, M, D))).astype(np.float32)
    u = (0.25 * rng.integers(-4, 4, (B, D))).astype(np.float32)
    mask = jnp.ones((B, M), bool)
    plain = qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT, quantized=True)
    shifted = qscore(jnp.asarray(m), jnp.asarray(u), FMT, FMT,
                     quantized=True, score_mod="shift")
    # raw sums here are exact multiples of 0.25 well inside the bound, so
    # the shifted scores are exactly plain - rowmax(plain)...
    np.testing.assert_array_equal(
        np.asarray(shifted),
        np.asarray(plain - jnp.max(plain, axis=-1, keepdims=True)))
    # ...and softmax is invariant to that
    np.testing.assert_allclose(np.asarray(softmax(shifted, mask)),
                               np.asarray(softmax(plain, mask)),
                               rtol=1e-6, atol=1e-7)


def test_config_wiring_and_exclusivity():
    assert QmannConfig(verbose=False).att_score_mod == "none"
    assert QmannConfig(en_att_shift=True,
                       verbose=False).att_score_mod == "shift"
    assert QmannConfig(en_att_clip=True,
                       verbose=False).att_score_mod == "clip"
    with pytest.raises(ValueError):
        QmannConfig(en_att_shift=True, en_att_clip=True, verbose=False)


@pytest.mark.parametrize("knob", ["en_att_shift", "en_att_clip"])
def test_model_forward_applies_score_mod(rng, knob):
    """The hop loop must produce the mitigated scores end-to-end."""
    B, M, dim_input, D = 4, 6, 20, 16
    cfg = QmannConfig(dim_emb=D, verbose=False, **{knob: True})
    base = QmannConfig(dim_emb=D, verbose=False)
    dims = DataDims(dim_dict=dim_input - M, max_line=M, max_word=6,
                    dim_word=7, dim_input=dim_input)
    mem = rng.integers(0, 2, (B, M, dim_input)).astype(np.float32)
    que = rng.integers(0, 2, (B, dim_input)).astype(np.float32)
    mask = np.ones((B, M), bool)
    params = memn2n.init_params(base, dims, jax.random.PRNGKey(0))
    # amplify the embeddings past the init scale (which quantizes to zero
    # at hop 0's Q6.1 step) so hop-0 raw score sums leave the Q5.2 bound —
    # the trained-into collapse regime, reproduced at init
    params = dict(params, A=params["A"] * 10.0, B=params["B"] * 40.0)

    out_mod = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                             jnp.asarray(mask), cfg)
    out_base = memn2n.forward(params, jnp.asarray(mem), jnp.asarray(que),
                              jnp.asarray(mask), base)
    s_mod = np.asarray(out_mod.scores[0])
    s_base = np.asarray(out_base.scores[0])
    maxf = float(fixed_max_float(FMT.iwl, FMT.frac))
    if knob == "en_att_shift":
        # hop 0 uses fmt_w[0]=Q6.1 for weights but fmt_att[0]=Q5.2 for the
        # score; with the x40 query the plain path saturates rows at maxf
        assert (s_base == maxf).any()
        assert np.all(s_mod <= 0.0)  # shifted scores are never positive
    else:
        assert np.all(np.abs(s_mod) <= maxf - 2.0 ** (-FMT.frac))


def test_sharded_shift_matches_single_device(rng):
    """The global-max shift over memory shards (pmax of raw row maxima)
    must be bit-identical to the single-device qscore(score_mod="shift"),
    and the whole sharded read must match the dense mitigated read."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallelism=4)
    cfg = QmannConfig(dim_emb=16, verbose=False, en_att_shift=True)
    B, M, D = 4, 8, 16
    fmt = cfg.fmt_act[0]
    # saturating magnitudes: raw sums exceed the Q5.2 bound
    m = rng.normal(0, 2.0, (B, M, D)).astype(np.float32)
    c = rng.normal(0, 1.0, (B, M, D)).astype(np.float32)
    u = (3.0 * rng.normal(0, 1.0, (B, D))).astype(np.float32)
    n_sen = rng.integers(2, M + 1, B)
    mask = np.arange(M)[None, :] < n_sen[:, None]

    o, p = memory_sharded_attention_read(
        mesh, jnp.asarray(m), jnp.asarray(c), jnp.asarray(u),
        jnp.asarray(mask), cfg)

    scores = qscore(jnp.asarray(m), jnp.asarray(u), cfg.fmt_att[0],
                    cfg.fmt_bin, quantized=True, score_mod="shift")
    p_ref = softmax(scores, jnp.asarray(mask))
    o_ref = qweighted_sum(jnp.asarray(c), p_ref,
                          jnp.asarray(mask, jnp.float32), fmt,
                          quantized=True)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)
    step_sz = 2.0 ** (-fmt.frac)
    assert np.max(np.abs(np.asarray(o) - np.asarray(o_ref))) <= step_sz
