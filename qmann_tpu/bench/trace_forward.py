"""Per-op device-time profile of the flagship qa1 forward (and optionally
the training epoch) — the TPU-native restoration of the reference's
time_profile[10][7] observability (MemN2N/MemN2N.c:133-141, report at
:3000-3021): where the reference clock()s every (layer, lifecycle-op)
pair, XLA's unit of execution is the fusion, so we capture a
jax.profiler trace, parse it in-process with jax.profiler.ProfileData,
and aggregate device time per HLO op and per model-phase bucket.

    python -m qmann_tpu.bench.trace_forward --out runs/trace_r3
    python -m qmann_tpu.bench.trace_forward --train --out runs/trace_r3_train
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import time

# model-phase buckets keyed on substrings of the HLO op_name metadata
# (jax records the originating jaxpr path there). Order matters: first
# match wins.
BUCKETS = [
    ("embed (A/C dense_mat)", ["qembed", "embed"]),
    ("query/linmap/output (qmatvec)", ["qmatvec", "matvec"]),
    ("attention score", ["attention", "score", "hamming"]),
    ("softmax", ["softmax"]),
    ("weighted sum", ["weighted"]),
    ("residual/sum/act", ["qsum", "activation"]),
    ("quantize", ["quant", "fixed"]),
    ("cross-entropy/pred", ["cross_entropy", "argmax", "log_softmax"]),
    ("sgd/clip/zeroing", ["sgd", "clip", "norm", "null"]),
    ("data movement", ["copy", "gather", "dynamic", "transpose-start",
                       "all-", "reduce-scatter"]),
]


def classify(op_name: str) -> str:
    low = op_name.lower()
    for label, keys in BUCKETS:
        if any(k in low for k in keys):
            return label
    return "other"


def aggregate_trace(trace_dir: str):
    """Parse the newest xplane dump under trace_dir; return
    (per-op totals, per-bucket totals, device total us)."""
    from jax.profiler import ProfileData
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    per_op = collections.Counter()      # duration us by (name, op_name)
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                # TensorCore planes name per-op lines differently across
                # versions; accept op-level lines only
                if "XLA" not in line.name and "op" not in line.name.lower():
                    continue
            if line.name == "XLA Modules" or line.name == "Steps":
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e3
                stats = {}
                for s in ev.stats:
                    try:
                        stats[s[0]] = s[1]
                    except Exception:
                        pass
                op_name = str(stats.get("op_name", "") or "")
                per_op[(ev.name, op_name)] += dur
    buckets = collections.Counter()
    for (name, op_name), us in per_op.items():
        buckets[classify(op_name or name)] += us
    total = sum(per_op.values())
    return per_op, buckets, total


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qmann_tpu.bench.trace_forward")
    p.add_argument("--out", default="runs/trace_r3")
    p.add_argument("--train", action="store_true",
                   help="profile the training epoch instead of inference")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--no-fast-path", action="store_true",
                   help="disable the runtime integer-fast-path conds "
                        "(A/B for their data-movement cost, PROFILE_r4)")
    args = p.parse_args(argv)

    from qmann_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from qmann_tpu.config import QmannConfig
    from qmann_tpu.data.native import load_task_native
    from qmann_tpu.models import memn2n
    from qmann_tpu.ops import cross_entropy
    from qmann_tpu.utils.profiling import trace

    cfg = QmannConfig(verbose=False,
                      en_integer_fast_path=not args.no_fast_path)
    data = load_task_native("qa1_single-supporting-fact", cfg.data_path,
                            raw_path=cfg.raw_data_path)
    params = memn2n.init_params(cfg, data.dims, jax.random.PRNGKey(0))

    if args.train:
        from qmann_tpu.train.trainer import _batched_arrays, train_epoch
        batches = {k: jnp.asarray(v) for k, v in
                   _batched_arrays(data.train, cfg.size_batch).items()}

        def run():
            # fast_path="config" lets --no-fast-path actually flip the
            # compiled program (train_epoch's measured default would
            # otherwise force the conds out in BOTH A/B arms)
            out = train_epoch(params, batches, jnp.float32(0.3), cfg, False,
                              fast_path="config")
            jax.block_until_ready(out)
            return out
    else:
        test = data.test
        batch = min(1000, len(test))
        memory = jnp.asarray(test.memory[:batch])
        question = jnp.asarray(test.question[:batch])
        answer = jnp.asarray(test.answer[:batch])
        mask = jnp.asarray(test.mask[:batch])
        k = 30

        @jax.jit
        def infer_scan(params, mem, que, ans, mask):
            def body(carry, _):
                out = memn2n.forward(params, mem, que + carry, mask, cfg)
                pred = cross_entropy(out.logits, ans).pred
                feedback = jnp.where(pred[0] < 0, 1.0, 0.0).astype(que.dtype)
                return feedback, pred
            _, preds = jax.lax.scan(body, jnp.zeros((), que.dtype), None,
                                    length=k)
            return preds

        # compiled cost analysis: the analytic floor terms
        lowered = infer_scan.lower(params, memory, question, answer, mask)
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = cost.get("flops", float("nan"))
            bts = cost.get("bytes accessed", float("nan"))
            print(json.dumps({"cost_analysis_flops": flops,
                              "cost_analysis_bytes": bts}))

        def run():
            out = infer_scan(params, memory, question, answer, mask)
            jax.block_until_ready(out)
            return out

    run()  # warmup/compile outside the trace
    t0 = time.perf_counter()
    with trace(args.out):
        for _ in range(args.iters):
            run()
    wall = time.perf_counter() - t0
    print(f"traced {args.iters} iterations, wall {wall:.3f}s -> {args.out}")

    per_op, buckets, total = aggregate_trace(args.out)
    print(f"\ndevice total: {total/1e3:.3f} ms over {args.iters} iters "
          f"({total/1e3/args.iters:.3f} ms/iter)")
    print("\n== per-phase buckets (the time_profile analog) ==")
    for label, us in buckets.most_common():
        print(f"  {label:<32s} {us/1e3:9.3f} ms  {100*us/total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for (name, op_name), us in per_op.most_common(args.top):
        print(f"  {us/1e3:9.3f} ms  {100*us/total:5.1f}%  {name}  {op_name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
