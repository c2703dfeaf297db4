"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md section 2.6) —
its only parallelism is single-GPU kernel blocks.  The TPU-native design
is SPMD over a 2-axis mesh:

  "data"  — batch data parallelism (across hosts this axis rides DCN)
  "model" — model parallelism: the memory-sentence axis (memory-bank
            sharding, the KV-cache/sequence-parallel analog for MemN2N's
            memory) and the vocabulary axis of the output layer ride ICI
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              model_parallelism: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    model_parallelism defaults to the largest power of two <= 4 dividing
    the device count (memory-bank shards), with the rest on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallelism is None:
        model_parallelism = 1
        for cand in (4, 2):
            if n % cand == 0:
                model_parallelism = cand
                break
    assert n % model_parallelism == 0, (n, model_parallelism)
    arr = np.asarray(devices).reshape(n // model_parallelism,
                                      model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (auto-detecting on
    TPU pods).  Call once per host before any jax op; afterwards
    make_hybrid_mesh() lays out the axes so "model" stays within a host
    (ICI) and "data" spans hosts (DCN)."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(model_parallelism: int = 4) -> Mesh:
    """Pod-scale mesh: the "model" axis (memory-bank shards + vocab TP)
    is confined to intra-host ICI neighbors, the "data" axis (DP) crosses
    hosts over DCN — the layout the north star prescribes
    (SURVEY.md section 2.6)."""
    from jax.experimental import mesh_utils
    import jax
    n = len(jax.devices())
    assert n % model_parallelism == 0, (n, model_parallelism)
    arr = mesh_utils.create_device_mesh(
        (n // model_parallelism, model_parallelism))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
