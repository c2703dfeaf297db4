"""Measure how much of bench.py's per-step time is host-dispatch latency
vs device compute: per-call dispatch (one jit call per batch, the
serving engine's regime; distinct pre-staged waves) against a
device-resident lax.scan over K batches (zero host round-trips between
batches — what bench.py times).

RELIABILITY CAVEAT (round 3): this environment's remote-tunnel per-call
latency is wildly non-stationary — the identical blocked 1000-query call
measured 0.07 ms, 1.0 ms, and 23.4 ms within one hour (verified-correct
outputs each time), a 300x swing that makes per-call numbers, including
the regular-vs-prepared comparison, unquotable here.  The scan-regime
number excludes dispatch entirely and reproduces across rounds; it is
the number of record (bench.py).

    python -m qmann_tpu.bench.probe_dispatch [--batch 1000] [--scan-k 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qmann_tpu.bench.probe_dispatch")
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--scan-k", type=int, default=30)
    args = p.parse_args(argv)

    from qmann_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data.native import load_task_native
    from qmann_tpu.models import memn2n
    from qmann_tpu.ops import cross_entropy

    cfg = QmannConfig(verbose=False)
    data = load_task_native("qa1_single-supporting-fact", cfg.data_path,
                            raw_path=cfg.raw_data_path)
    params = memn2n.init_params(cfg, data.dims, jax.random.PRNGKey(0))
    t = data.test
    n = min(args.batch, len(t))
    # distinct pre-staged waves (rolled copies of the test split): serving
    # waves differ call-to-call, and identical repeated executions can be
    # short-circuited between the host and the remote device
    nrot = 8
    import numpy as np
    waves = []
    for r in range(nrot):
        idx = np.roll(np.arange(n), r)
        waves.append((jnp.asarray(t.memory[idx]), jnp.asarray(t.question[idx]),
                      jnp.asarray(t.answer[idx]), jnp.asarray(t.mask[idx])))
    jax.block_until_ready(waves)
    mem, que, ans, mask = waves[0]

    @jax.jit
    def infer(params, mem, que, ans, mask):
        out = memn2n.forward(params, mem, que, mask, cfg)
        return cross_entropy(out.logits, ans).pred

    pred = infer(params, *waves[0])
    jax.block_until_ready(pred)
    t0 = time.perf_counter()
    preds = [infer(params, *waves[i % nrot]) for i in range(args.iters)]
    jax.block_until_ready(preds)
    per_call = n * args.iters / (time.perf_counter() - t0)

    k = args.scan_k

    @jax.jit
    def infer_scan(params, mem, que, ans, mask):
        # thread a runtime-zero scalar derived from the previous batch's
        # predictions into the next batch's query so XLA cannot hoist the
        # loop-invariant forward out of the scan
        def body(carry, _):
            out = memn2n.forward(params, mem, que + carry, mask, cfg)
            pred = cross_entropy(out.logits, ans).pred
            feedback = jnp.where(pred[0] < 0, 1.0, 0.0).astype(que.dtype)
            return feedback, pred
        _, preds = jax.lax.scan(body, jnp.zeros((), que.dtype), None,
                                length=k)
        return preds

    preds = infer_scan(params, mem, que, ans, mask)
    jax.block_until_ready(preds)
    t0 = time.perf_counter()
    preds = infer_scan(params, mem, que, ans, mask)
    jax.block_until_ready(preds)
    scan_qps = n * k / (time.perf_counter() - t0)

    # per-call with serving-prepared weights (the engine's regime): the
    # per-call fixed work the prepared path removes — weight quantize/
    # stack/cast + fast-path cond dispatch — is exactly what this probe's
    # per-call number pays on every wave
    prepared = memn2n.prepare_inference(
        params, cfg, max_count=float(data.dims.max_word + 1),
        max_rowsum=float(data.dims.max_word + 1))

    @jax.jit
    def infer_prepared(mem, que, ans, mask):
        out = memn2n.forward_prepared(prepared, mem, que, mask, cfg)
        return cross_entropy(out.logits, ans).pred

    pred = infer_prepared(*waves[0])
    jax.block_until_ready(pred)
    t0 = time.perf_counter()
    preds = [infer_prepared(*waves[i % nrot]) for i in range(args.iters)]
    jax.block_until_ready(preds)
    per_call_prepared = n * args.iters / (time.perf_counter() - t0)

    print(json.dumps({
        "per_call_qps": round(per_call, 1),
        "per_call_prepared_qps": round(per_call_prepared, 1),
        "prepared_speedup_x": round(per_call_prepared / per_call, 2),
        "device_scan_qps": round(scan_qps, 1),
        "dispatch_overhead_x": round(scan_qps / per_call, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
