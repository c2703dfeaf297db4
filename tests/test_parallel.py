"""Multi-device tests on the virtual 8-device CPU mesh: the sharded
training step must match the single-device step, and the explicit
shard_map memory-sharded attention must match the dense computation.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qmann_tpu.config import QmannConfig
from qmann_tpu.data import DataDims
from qmann_tpu.models import memn2n
from qmann_tpu.parallel import (
    make_mesh, make_sharded_train_step, memory_sharded_attention_read,
    shard_batch, shard_params,
)
from qmann_tpu.ops import qweighted_sum, qscore, softmax
from qmann_tpu.train.optim import sgd_update, zero_null_columns


def _requires_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def make_case(rng, n=8, m=8, dim_input=24, dim_emb=16, hops=3):
    cfg = QmannConfig(dim_emb=dim_emb, num_hops=hops, verbose=False)
    dims = DataDims(dim_dict=dim_input - m, max_line=m, max_word=6,
                    dim_word=7, dim_input=dim_input)
    mem = rng.integers(0, 2, (n, m, dim_input)).astype(np.float32)
    que = rng.integers(0, 2, (n, dim_input)).astype(np.float32)
    ans = np.zeros((n, dim_input), np.float32)
    ans[np.arange(n), rng.integers(1, dim_input, n)] = 1.0
    n_sen = rng.integers(1, m + 1, n)
    mask = np.arange(m)[None, :] < n_sen[:, None]
    mem = mem * mask[:, :, None]
    batch = {
        "memory": mem, "question": que, "answer": ans, "mask": mask,
        "sample_mask": np.ones(n, np.float32),
    }
    return cfg, dims, batch


def test_mesh_axes():
    _requires_8_devices()
    mesh = make_mesh(8)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    mesh2 = make_mesh(8, model_parallelism=2)
    assert mesh2.devices.shape == (4, 2)


def test_sharded_train_step_matches_single_device(rng):
    _requires_8_devices()
    cfg, dims, batch = make_case(rng)
    mesh = make_mesh(8, model_parallelism=4)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))

    # single-device reference step
    def ref_step(p):
        def loss_fn(p_):
            loss, met = memn2n.loss_and_metrics(
                p_, jnp.asarray(batch["memory"]),
                jnp.asarray(batch["question"]), jnp.asarray(batch["answer"]),
                jnp.asarray(batch["mask"]), jnp.asarray(batch["sample_mask"]),
                cfg, False)
            return loss, met
        grads, met = jax.grad(loss_fn, has_aux=True)(p)
        p = sgd_update(p, grads, jnp.float32(0.3), jnp.float32(8.0), cfg)
        return zero_null_columns(p, cfg), met

    ref_params, ref_met = ref_step(dict(params))

    step = make_sharded_train_step(cfg, mesh)
    sp = shard_params(mesh, dict(params))
    sb = shard_batch(mesh, batch)
    out_params, cost, matches = step(sp, sb, jnp.float32(0.3),
                                     jnp.float32(8.0))
    for k in ref_params:
        np.testing.assert_allclose(np.asarray(out_params[k]),
                                   np.asarray(ref_params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    np.testing.assert_allclose(float(cost), float(ref_met.cost), rtol=1e-4)
    assert int(matches) == int(ref_met.matches)


@pytest.mark.parametrize("quantized", [True, False])
def test_memory_sharded_attention_matches_dense(rng, quantized):
    _requires_8_devices()
    mesh = make_mesh(8, model_parallelism=4)
    cfg = QmannConfig(dim_emb=16, verbose=False,
                      en_fixed_point=quantized,
                      attention_mode=2 if quantized else 1)
    B, M, D = 4, 8, 16
    fmt = cfg.fmt_act[0]
    m = rng.normal(0, 1.0, (B, M, D)).astype(np.float32)
    c = rng.normal(0, 1.0, (B, M, D)).astype(np.float32)
    u = rng.normal(0, 1.0, (B, D)).astype(np.float32)
    n_sen = rng.integers(2, M + 1, B)
    mask = np.arange(M)[None, :] < n_sen[:, None]

    o, p = memory_sharded_attention_read(
        mesh, jnp.asarray(m), jnp.asarray(c), jnp.asarray(u),
        jnp.asarray(mask), cfg)

    # dense reference
    scores = qscore(jnp.asarray(m), jnp.asarray(u), cfg.fmt_att[0],
                    cfg.fmt_bin, quantized=quantized)
    p_ref = softmax(scores, jnp.asarray(mask))
    o_ref = qweighted_sum(jnp.asarray(c), p_ref,
                          jnp.asarray(mask, jnp.float32).astype(jnp.float32),
                          fmt, quantized=quantized)

    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)
    if quantized:
        # quantized outputs live on the 2^-frac grid; distributed and dense
        # results may differ by at most one grid step at exp-sum boundaries
        step_sz = 2.0 ** (-fmt.frac)
        assert np.max(np.abs(np.asarray(o) - np.asarray(o_ref))) <= step_sz
    else:
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_attention_gradients_match_dense(rng):
    """Gradient PARITY with the dense computation — not just flow: with
    check_vma=False the psum transposes silently scale cotangents by the
    mesh-axis size (the round-3 bug this guards against)."""
    _requires_8_devices()
    mesh = make_mesh(8, model_parallelism=4)
    cfg = QmannConfig(dim_emb=16, verbose=False, en_fixed_point=False,
                      attention_mode=1)
    B, M, D = 4, 8, 16
    m = jnp.asarray(rng.normal(0, 1.0, (B, M, D)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 1.0, (B, M, D)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 1.0, (B, D)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(0, 1.0, (B, D)).astype(np.float32))
    mask = jnp.ones((B, M), bool)

    def f(m_, c_, u_):
        o, _ = memory_sharded_attention_read(mesh, m_, c_, u_, mask, cfg)
        return jnp.sum(o * g_out)

    def f_dense(m_, c_, u_):
        scores = qscore(m_, u_, cfg.fmt_att[0], cfg.fmt_bin, quantized=False)
        p = softmax(scores, mask)
        o = qweighted_sum(c_, p, jnp.ones((B, M), jnp.float32),
                          cfg.fmt_act[0], quantized=False)
        return jnp.sum(o * g_out)

    grads = jax.grad(f, argnums=(0, 1, 2))(m, c, u)
    ref = jax.grad(f_dense, argnums=(0, 1, 2))(m, c, u)
    for got, want, name in zip(grads, ref, ("dm", "dc", "du")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_hybrid_mesh_shapes():
    _requires_8_devices()
    from qmann_tpu.parallel.mesh import make_hybrid_mesh
    mesh = make_hybrid_mesh(model_parallelism=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)


def test_explicit_collective_train_step_matches_single_device(rng):
    """The hand-scheduled shard_map step (parallel.explicit) — per-hop
    psum'd attention reads, psum_cotangent query boundary, explicit grad
    reductions — must reproduce the single-device SGD step."""
    _requires_8_devices()
    from qmann_tpu.parallel import make_explicit_train_step
    cfg, dims, batch = make_case(rng)
    mesh = make_mesh(8, model_parallelism=4)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))

    def ref_step(p):
        def loss_fn(p_):
            loss, met = memn2n.loss_and_metrics(
                p_, jnp.asarray(batch["memory"]),
                jnp.asarray(batch["question"]), jnp.asarray(batch["answer"]),
                jnp.asarray(batch["mask"]), jnp.asarray(batch["sample_mask"]),
                cfg, False)
            return loss, met
        grads, met = jax.grad(loss_fn, has_aux=True)(p)
        p = sgd_update(p, grads, jnp.float32(0.3), jnp.float32(8.0), cfg)
        return zero_null_columns(p, cfg), met

    ref_params, ref_met = ref_step(dict(params))

    step = make_explicit_train_step(cfg, mesh)
    sp = shard_params(mesh, dict(params))
    sb = shard_batch(mesh, batch)
    out_params, cost, matches = step(sp, sb, jnp.float32(0.3),
                                     jnp.float32(8.0))
    for k in ref_params:
        np.testing.assert_allclose(np.asarray(out_params[k]),
                                   np.asarray(ref_params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    np.testing.assert_allclose(float(cost), float(ref_met.cost), rtol=1e-4)
    assert int(matches) == int(ref_met.matches)


def test_explicit_step_rejects_unsupported_wiring():
    from qmann_tpu.parallel import make_explicit_train_step
    _requires_8_devices()
    mesh = make_mesh(8, model_parallelism=4)
    with pytest.raises(NotImplementedError):
        make_explicit_train_step(
            QmannConfig(type_weight_tying=1, verbose=False), mesh)


@pytest.mark.parametrize("att_mode", [2, 3])
def test_sharded_prepared_infer_matches_single(rng, att_mode):
    """The mesh-aware PREPARED (serving) forward must be bit-identical to
    the single-device prepared forward: same preds, same cost — for the
    flagship mode 2 and the Hamming mode 3."""
    from qmann_tpu.ops import cross_entropy
    from qmann_tpu.parallel import make_sharded_prepared_infer
    _requires_8_devices()
    cfg, dims, batch = make_case(rng)
    cfg = cfg.replace(attention_mode=att_mode)
    mesh = make_mesh(8, model_parallelism=4)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))
    prep = memn2n.prepare_inference(
        params, cfg, max_count=2.0,
        max_rowsum=float(batch["memory"].sum(-1).max()))
    assert prep.fast

    out = memn2n.forward_prepared(
        prep, jnp.asarray(batch["memory"]), jnp.asarray(batch["question"]),
        jnp.asarray(batch["mask"]), cfg)
    met = cross_entropy(out.logits, jnp.asarray(batch["answer"]))

    infer = make_sharded_prepared_infer(prep, cfg, mesh)
    cost, matches, preds = infer(batch["memory"], batch["question"],
                                 batch["answer"], batch["mask"])
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(met.pred))
    assert int(matches) == int(met.matches)
    np.testing.assert_allclose(float(cost), float(met.cost), rtol=1e-6)


def test_eval_split_mesh_matches_plain(rng):
    """eval_split over a mesh (batch over 'data', memory banks over
    'model') must agree with the single-device path."""
    from qmann_tpu.data.babi import VectorizedSplit
    from qmann_tpu.train import eval_split
    _requires_8_devices()
    cfg, dims, batch = make_case(rng, n=24)
    mesh = make_mesh(8, model_parallelism=4)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(1))
    n_sen = batch["mask"].sum(-1).astype(np.int32)
    split = VectorizedSplit(batch["memory"], batch["question"],
                            batch["answer"], n_sen,
                            batch["answer"].argmax(-1).astype(np.int32))
    cost0, err0, preds0 = eval_split(params, split, cfg, chunk=16)
    sp = shard_params(mesh, params)
    cost1, err1, preds1 = eval_split(sp, split, cfg, chunk=16, mesh=mesh)
    np.testing.assert_array_equal(preds0, preds1)
    assert err0 == err1
    np.testing.assert_allclose(cost0, cost1, rtol=1e-6)


def test_memory_sharded_attention_mode3_matches_dense(rng):
    """Mode-3 (Hamming) sharded attention read: forward AND gradients
    must match the dense composition — including the quantized
    weighted-sum backward that mode 3 applies whenever the layer is
    fixed (cuda_dot_mat_vec_bwd_appx, lib/layer.c:588-599)."""
    from qmann_tpu.ops.attention import hamming_score
    _requires_8_devices()
    mesh = make_mesh(8, model_parallelism=4)
    cfg = QmannConfig(dim_emb=16, verbose=False, attention_mode=3)
    B, M, D = 4, 8, 16
    fmt = cfg.fmt_act[0]
    act = cfg.fmt_att[0]
    m = np.asarray(jnp.asarray(rng.normal(0, 1.0, (B, M, D)),
                               jnp.float32))
    c = rng.normal(0, 1.0, (B, M, D)).astype(np.float32)
    u = rng.normal(0, 1.0, (B, D)).astype(np.float32)
    n_sen = rng.integers(2, M + 1, B)
    mask = np.arange(M)[None, :] < n_sen[:, None]
    g_out = rng.normal(0, 1.0, (B, D)).astype(np.float32)

    def f_sharded(m_, c_, u_):
        o, _ = memory_sharded_attention_read(
            mesh, m_, c_, u_, jnp.asarray(mask), cfg)
        return jnp.sum(o * jnp.asarray(g_out))

    def f_dense(m_, c_, u_):
        s = hamming_score(m_, u_, act.iwl, cfg.num_bits_attention,
                          cfg.attention_const_scale, act.mode)
        p = softmax(s, jnp.asarray(mask))
        o = qweighted_sum(c_, p, jnp.asarray(mask, jnp.float32), fmt,
                          quantized=True, grad_quantized=True)
        return jnp.sum(o * jnp.asarray(g_out))

    args = (jnp.asarray(m), jnp.asarray(c), jnp.asarray(u))
    np.testing.assert_allclose(float(f_sharded(*args)),
                               float(f_dense(*args)), rtol=1e-6)
    gs = jax.grad(f_sharded, argnums=(0, 1, 2))(*args)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gs, gd, ("dm", "dc", "du")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
