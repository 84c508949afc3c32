"""Data-parallel inference/eval over a device mesh.

The reference evaluates DDP-style — each rank runs its dataloader shard and
predictions are all_gathered (`util/misc.py:173-217`). Here a single jitted
inference function runs on batches sharded over the mesh's `data` axis;
results come back as global arrays (XLA handles the gather), so the host
loop in `eval.evaluator` is unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ziragroundingdino_tpu.parallel.mesh import batch_sharding, replicated


def make_sharded_inference_fn(
    inference_fn: Callable, mesh: Mesh, params
) -> Callable:
    """Wraps a (params, batch)->dets function: params replicated, batch
    sharded on `data`. Returns (batch)->dets; the global batch size must be
    divisible by the data-axis size."""
    params_sh = jax.device_put(params, replicated(mesh))

    def fn(batch: Dict):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch = jax.device_put(batch, batch_sharding(batch, mesh))
        return inference_fn(params_sh, batch)

    return fn


def pad_batch_to(batch: Dict, size: int) -> Dict:
    """Repeat-pad every batch array's leading dim to `size` (for the final
    short eval batch on an N-way mesh); pair with `real_count`."""
    import numpy as np

    out = {}
    for k, v in batch.items():
        if k == "real_count":
            out[k] = v
            continue
        v = np.asarray(v)
        if v.ndim == 0 or v.shape[0] >= size:
            out[k] = v
            continue
        reps = [v[-1:]] * (size - v.shape[0])
        out[k] = np.concatenate([v] + reps, axis=0)
    return out
