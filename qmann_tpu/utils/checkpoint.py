"""Checkpointing with Q-format metadata.

The reference's weight I/O is raw per-matrix binary dumps in float and
fixed formats, shipped but disabled (MemN2N/MemN2N.c:2853-2978 write,
:2553-2618 load; EN_LOAD_WEIGHT/EN_WRITE_WEIGHT define.h:119-120), plus an
in-memory best-model snapshot (dev_w_mat_best, :2174-2196).

Here a checkpoint is a directory with:
  * params.npz      — float32 master weights (the training state)
  * params_fixed.npz — the same weights fake-quantized at their serving
    Q-formats (the analog of the *_fixed.bin dumps — what a fixed-point
    inference engine would load)
  * meta.json       — config + Q-format + data-dims metadata
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import numpy as np

from qmann_tpu.config import QmannConfig
from qmann_tpu.numerics import float_quant


def _weight_format(name: str, cfg: QmannConfig):
    """Serving Q-format per parameter (MemN2N/MemN2N.c:826-912 wiring)."""
    import jax.numpy as jnp  # noqa: F401
    if name in ("A", "B", "E"):
        return cfg.fmt_w[0]
    if name in ("C", "H"):
        return cfg.fmt_w[0]
    if name == "W":
        return cfg.fmt_ds_ans
    return cfg.fmt_act[0]


def save_checkpoint(ckpt_dir: str, params: Dict, cfg: QmannConfig, dims,
                    tag: str = "model", dictionary=None) -> str:
    path = os.path.join(ckpt_dir, tag)
    os.makedirs(path, exist_ok=True)
    np_params = {k: np.asarray(v) for k, v in params.items()}
    np.savez(os.path.join(path, "params.npz"), **np_params)
    fixed = {k: np.asarray(float_quant(v, _weight_format(k, cfg)))
             for k, v in np_params.items()}
    np.savez(os.path.join(path, "params_fixed.npz"), **fixed)
    meta = {
        "config": dataclasses.asdict(cfg),
        "dims": dataclasses.asdict(dims) if dataclasses.is_dataclass(dims)
                else dict(dims),
        "formats": {k: {"iwl": _weight_format(k, cfg).iwl,
                        "frac": _weight_format(k, cfg).frac}
                    for k in np_params},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    if dictionary is not None:
        with open(os.path.join(path, "dictionary.json"), "w") as f:
            json.dump(list(dictionary.words), f)
    return path


def load_checkpoint(path: str, fixed: bool = False
                    ) -> Tuple[Dict, QmannConfig, dict]:
    fname = "params_fixed.npz" if fixed else "params.npz"
    with np.load(os.path.join(path, fname)) as z:
        params = {k: z[k] for k in z.files}
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cfg = QmannConfig(**meta["config"])
    return params, cfg, meta["dims"]
