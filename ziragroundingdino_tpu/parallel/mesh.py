"""Device mesh + sharding rules.

Replaces the reference's distributed substrate — detectron2 `launch` + torch
DDP + NCCL process groups (`train_net.py:343-350,246`, `util/misc.py:577-635`)
— with the JAX SPMD model: one `Mesh`, `NamedSharding` annotations, and XLA
inserting the collectives (psum over ICI for gradients; no hand-written
comm code, SURVEY §2.5).

Axes:
  * `data`  — batch sharding (the reference's only strategy: DDP);
  * `model` — optional tensor parallelism for headroom beyond parity
    (GDINO-T fits one chip; TP shards the FFN/attention projection matmuls
    the scaling-book way: column-parallel in, row-parallel out).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, seq: int = 1, pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fixed = model * seq * pipe
    if data == -1:
        if n % fixed:
            raise ValueError(
                f"{n} devices not divisible by model*seq*pipe={fixed}")
        data = n // fixed
    if data * fixed != n:
        raise ValueError(
            f"mesh {data}x{pipe}x{seq}x{model} needs {data * fixed} devices but "
            f"only {n} are visible ({[d.platform for d in devices[:4]]}...); for "
            "CPU simulation set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "before jax initializes"
        )
    # seq innermost after model so seq-axis collectives (the per-layer value
    # all-gather, parallel/sp.py) ride the fastest ICI neighbours; pipe next
    # to data — its only traffic is the nearest-neighbour GPipe shift
    # (parallel/pp.py), which any contiguous placement serves
    arr = np.asarray(devices).reshape(data, pipe, seq, model)
    return Mesh(arr, ("data", "pipe", "seq", "model"))


# param-path regexes -> PartitionSpec for the tensor-parallel axis.
# Column-parallel (shard output features): FFN up-projections, qkv.
# Row-parallel (shard input features): FFN down-projections, out-projections.
_TP_RULES = (
    (r"linear1/kernel$", P(None, "model")),
    (r"linear2/kernel$", P("model", None)),
    (r"intermediate_dense/kernel$", P(None, "model")),
    (r"output_dense/kernel$", P("model", None)),
    (r"in_proj_kernel$", P(None, "model")),
    (r"qkv/kernel$", P(None, "model")),
    (r"mlp_fc1/kernel$", P(None, "model")),
    (r"mlp_fc2/kernel$", P("model", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_sharding(params, mesh: Mesh):
    """NamedSharding tree for the parameter pytree: TP rules where they apply
    (and divide evenly), replicated otherwise."""

    def rule(path, leaf):
        p = _path_str(path)
        if mesh.shape["model"] > 1:
            for pat, spec in _TP_RULES:
                if re.search(pat, p):
                    # only shard if the sharded dim divides evenly
                    ok = True
                    for dim, axis in enumerate(spec):
                        if axis == "model" and leaf.shape[dim] % mesh.shape["model"]:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(batch, mesh: Mesh):
    """Shard every batch array on its leading (batch) axis over `data`."""

    def rule(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))

    return jax.tree_util.tree_map(rule, batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
