"""On-chip A/B of forward backends on bench.py's EXACT scan program.

Variants (all serving-prepared, all verified to produce identical
predictions before timing):
  unfused   forward_prepared, XLA fusion hop chain (bench.py's default)
  chain     forward_prepared + use_fused_chain: the whole K-hop loop as
            ONE Pallas program per batch tile (ops/pallas/qkernels.
            fused_hop_chain_pallas)
  read      forward_prepared + use_pallas: per-hop fused Pallas read
            (the round-3 variant, kept for the record)

    python -m qmann_tpu.bench.backend_ab [--repeats 7] [--variants unfused,chain]

Each Pallas variant costs a multi-minute remote compile on first run;
the persistent compilation cache makes re-runs cheap.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qmann_tpu.bench.backend_ab")
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--scan-k", type=int, default=30)
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--variants", default="unfused,chain")
    p.add_argument("--attention-mode", type=int, default=2,
                   choices=[1, 2, 3],
                   help="attention mode under test; 3 = Hamming (the "
                        "paper's core op — variants unfused/hamming/"
                        "read/chain give XLA lattice vs Pallas score-only "
                        "vs per-hop fused read vs whole-chain)")
    p.add_argument("--chain-tile", type=int, default=0,
                   help="override the chain kernel's batch tile")
    p.add_argument("--synthetic", default="",
                   help="V,M,W,D: skip bAbI — random BoW stories with "
                        "dict size V, M memory rows, W words/row, "
                        "dim_emb D (the Pallas crossover-table dims)")
    args = p.parse_args(argv)

    from qmann_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data.native import load_task_native
    from qmann_tpu.models import memn2n
    from qmann_tpu.ops import cross_entropy

    if args.chain_tile:
        from qmann_tpu.ops.pallas import qkernels
        qkernels.DEFAULT_CHAIN_TILE = args.chain_tile

    base = QmannConfig(verbose=False, attention_mode=args.attention_mode)
    if args.synthetic:
        # crossover-table dims: random BoW stories shaped like a scaled-up
        # task (the reference dims are V=19/M=10/W=6/D=60 on qa1)
        from qmann_tpu.data.babi import DataDims

        V, M, W, D = (int(t) for t in args.synthetic.split(","))
        dims = DataDims(V, M, W, W + 1, V + M)
        base = base.replace(dim_emb=D)
        rng = np.random.default_rng(0)
        B = args.batch
        mem = np.zeros((B, M, V + M), np.float32)
        b_ix = np.arange(B)[:, None, None]
        m_ix = np.arange(M)[None, :, None]
        np.add.at(mem, (b_ix, m_ix, rng.integers(0, V, (B, M, W))), 1.0)
        mem[:, np.arange(M), V + np.arange(M)] = 1.0  # temporal one-hots
        que = np.zeros((B, V + M), np.float32)
        np.add.at(que, (np.arange(B)[:, None],
                        rng.integers(0, V, (B, W))), 1.0)
        ans = np.zeros((B, V + M), np.float32)
        ans[np.arange(B), rng.integers(0, V, B)] = 1.0
        memory, question, answer = (jnp.asarray(a) for a in (mem, que, ans))
        mask = jnp.ones((B, M), jnp.float32)
        batch = B
        max_count, max_rowsum = float(mem.max()), float(
            np.abs(mem).sum(-1).max())
    else:
        data = load_task_native("qa1_single-supporting-fact", base.data_path,
                                raw_path=base.raw_data_path)
        dims = data.dims
        test = data.test
        batch = min(args.batch, len(test))
        memory = jnp.asarray(test.memory[:batch])
        question = jnp.asarray(test.question[:batch])
        answer = jnp.asarray(test.answer[:batch])
        mask = jnp.asarray(test.mask[:batch])
        max_count = max_rowsum = float(dims.max_word + 1)
    params = memn2n.init_params(base, dims, jax.random.PRNGKey(0))
    k = args.scan_k

    cfgs = {
        "unfused": base,
        "chain": base.replace(use_fused_chain=True),
        "read": base.replace(use_pallas=True),
        # mode-3 only: Pallas for JUST the Hamming bit-lattice score
        "hamming": base.replace(use_pallas_hamming=True),
    }

    def build(cfg):
        prepared = memn2n.prepare_inference(
            params, cfg, max_count=max_count, max_rowsum=max_rowsum)
        assert prepared.fast

        @jax.jit
        def infer_scan(mem, que, ans, mask):
            def body(carry, _):
                out = memn2n.forward_prepared(prepared, mem, que + carry,
                                              mask, cfg)
                pred = cross_entropy(out.logits, ans).pred
                feedback = jnp.where(pred[0] < 0, 1.0, 0.0).astype(que.dtype)
                return feedback, pred
            _, preds = jax.lax.scan(body, jnp.zeros((), que.dtype), None,
                                    length=k)
            return preds
        return infer_scan

    names = [v.strip() for v in args.variants.split(",") if v.strip()]
    if "hamming" in names and args.attention_mode != 3:
        p.error("--variants hamming is mode-3 only (use_pallas_hamming is "
                "a no-op elsewhere; the A/B would compare identical "
                "programs)")
    ref_preds = None
    rows = []
    for name in names:
        fn = build(cfgs[name])
        t0 = time.perf_counter()
        preds = fn(memory, question, answer, mask)
        jax.block_until_ready(preds)
        compile_s = time.perf_counter() - t0
        if ref_preds is None:
            ref_preds = np.asarray(preds)
        else:
            np.testing.assert_array_equal(np.asarray(preds), ref_preds,
                                          err_msg=f"{name} diverges")
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(memory, question, answer, mask)
            jax.block_until_ready(out)
            samples.append(batch * k / (time.perf_counter() - t0))
        rows.append({"variant": name,
                     "qps_median": round(float(np.median(samples)), 1),
                     "qps_min": round(min(samples), 1),
                     "qps_max": round(max(samples), 1),
                     "first_call_s": round(compile_s, 1),
                     "outputs_identical": True})
        print(json.dumps(rows[-1]), flush=True)
    if len(rows) > 1:
        best = max(rows, key=lambda r: r["qps_median"])
        print(json.dumps({"winner": best["variant"],
                          "speedup_vs_unfused": round(
                              best["qps_median"] / rows[0]["qps_median"],
                              3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
