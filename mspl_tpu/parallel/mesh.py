"""Device mesh and sharding helpers (SURVEY.md §2 parallelism table).

The reference's only parallelism is single-process data parallelism
(`nn.DataParallel`) — no NCCL/MPI/process groups (SURVEY.md §5 "Distributed
communication backend: None").  TPU-native, parallelism is declarative:

* mesh axis `data`   — batch sharding for training and pseudo-label
  generation; gradient/metric reductions become XLA `psum` over ICI;
* mesh axis `model`  — source-model parallelism for multi-source fusion:
  each `model` slice holds one source network and the fused probability
  average is a `psum`/mean over the axis (see mspl_tpu/pseudo/generate.py).

Everything runs through `jax.jit` + `NamedSharding` (GSPMD): we annotate
input shardings; XLA inserts the collectives.  A consequence vs the
reference: BatchNorm batch statistics default to the *global* batch (synced
BN) rather than per-replica.  The per-replica semantics are available behind
a flag (`--bn-groups N` / `TrainLoopConfig.bn_groups`, SURVEY.md §7 "BN
under pmap"): BN statistics are computed per contiguous batch group, which
with groups == data shards matches torch-DataParallel BN and keeps each
group's reduction shard-local — see mspl_tpu/layers/bn.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Join a multi-host TPU job when launch env vars are present.

    Single-slice multi-chip needs nothing (one process sees all chips over
    ICI); across hosts JAX coordinates over DCN via
    ``jax.distributed.initialize``.  Controlled by env vars so single-host
    runs (tests, CLI, bench) are untouched:

      MSPL_COORDINATOR   host:port of process 0
      MSPL_NUM_PROCESSES total process count
      MSPL_PROCESS_ID    this process's index

    After this, ``jax.devices()`` spans the whole job and the same mesh /
    GSPMD code paths shard over it — no other code changes anywhere.
    Returns True if distributed mode was initialized.
    """
    import os

    coord = os.environ.get("MSPL_COORDINATOR")
    if not coord:
        return False
    missing = [v for v in ("MSPL_NUM_PROCESSES", "MSPL_PROCESS_ID")
               if v not in os.environ]
    if missing:
        raise RuntimeError(
            "MSPL_COORDINATOR is set but required companion env var(s) "
            f"{', '.join(missing)} are missing; a multi-host launch must set "
            "all of MSPL_COORDINATOR, MSPL_NUM_PROCESSES, MSPL_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["MSPL_NUM_PROCESSES"]),
        process_id=int(os.environ["MSPL_PROCESS_ID"]),
    )
    return True


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """`jax.shard_map` across JAX versions (ADVICE r3: bench.py and
    pseudo/generate.py each carried their own copy of this fallback).

    Newer JAX exposes `jax.shard_map` with `check_vma`; older versions only
    have `jax.experimental.shard_map.shard_map` with `check_rep`.  Both
    checks are disabled: pallas_call outputs carry no varying-mesh-axes /
    replication annotation, and every mspl_tpu shard_map region is
    shard-local by construction (batch sharded over 'data').
    """
    try:
        from jax import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('model', 'data') mesh.

    `model` is the number of source-model slices (1 = pure DP); `data` is
    inferred from the device count when None.  The `data` axis is placed
    innermost so gradient all-reduces ride adjacent-ICI links.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        if n % model:
            raise ValueError(f"device count {n} not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {model}x{data} needs {model * data} devices, have {n}")
    grid = np.asarray(devs[: data * model]).reshape(model, data)
    return Mesh(grid, axis_names=("model", "data"))


def make_mesh_for_batch(batch_size: int, model: int = 1,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Mesh whose `data` axis evenly divides `batch_size` (largest such axis
    available) — keeps small-batch jobs valid on large slices."""
    import math

    devs = list(devices if devices is not None else jax.devices())
    per_model = max(len(devs) // model, 1)
    data = math.gcd(batch_size, per_model)
    return make_mesh(data=data, model=model, devices=devs[: data * model])


def shard_batch(batch: Dict, mesh: Mesh):
    """Put a host batch onto the mesh sharded along leading dim over 'data'
    (replicated over 'model')."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
