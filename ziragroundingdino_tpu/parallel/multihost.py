"""Multi-host input pipeline: per-process data sharding + global batch
assembly.

The reference runs one DataLoader per rank (detectron2 `launch` forks one
process per GPU; each builds its own loader over a rank-strided sampler —
`util/misc.py:577-635` + torch DistributedSampler semantics). The JAX
equivalent for a v5e pod: every host process loads ONLY its shard of each
global batch and the global device array is assembled with
`jax.make_array_from_process_local_data`, which never materializes the full
batch on any single host.

Works transparently in single-process runs (process_count()==1): the local
shard IS the global batch and assembly degenerates to device_put with the
requested sharding.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch (must divide evenly, like the
    per-GPU batch in the reference's DDP setup)."""
    n = process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n


def shard_indices_for_process(
    n_items: int,
    seed: int,
    epoch: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
) -> np.ndarray:
    """Rank-strided index shard (torch DistributedSampler semantics: same
    seeded permutation on every process, then stride by process count with
    rank offset; pad-to-even by wrapping when not dropping the tail).

    NOTE: the training DataLoader uses a different, equivalent scheme — each
    process takes its CONTIGUOUS sub-slice of every seeded global batch
    (`data/loader.py::_index_stream`), which keeps global batch membership
    identical across process counts. This epoch-level sampler is for
    eval/epoch-style sweeps where per-process passes over a fixed split are
    wanted instead."""
    rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2**31 - 1))
    order = rng.permutation(n_items) if shuffle else np.arange(n_items)
    n, r = process_count(), process_index()
    if drop_last:
        usable = (n_items // n) * n
        order = order[:usable]
    else:
        pad = (-len(order)) % n
        if pad:
            order = np.concatenate([order, order[:pad]])
    return order[r::n]


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble a data-sharded global batch from this process's local shard.

    Every process must call this collectively with equal-shaped local
    shards; the result is a global jax.Array of leading dim
    (process_count * local_b), sharded over the mesh's `data` axis, with
    each shard resident only on its owning host's devices.
    """

    def assemble(x):
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        if process_count() == 1:
            # device_put reshards committed jax.Arrays device-to-device;
            # forcing np.asarray here would round-trip through the host
            return jax.device_put(x, sharding)
        x = np.asarray(x)  # make_array_* consumes process-local host data
        global_shape = (x.shape[0] * process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return {k: assemble(v) for k, v in local_batch.items()}


def barrier():
    """Barrier equivalent of the reference's dist.barrier()
    (`util/misc.py:632`): a tiny psum across all devices."""
    if process_count() == 1:
        return
    import jax.numpy as jnp

    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),))
    )
    jax.block_until_ready(out)
