"""Sequence parallelism over the flattened image tokens.

The reference has no sequence/context parallelism — its only long-sequence
mitigation is activation checkpointing (`transformer_for_adapter.py:578-586,
629-638`; SURVEY §2.5 marks SP "none required for parity"). This module goes
beyond parity: it shards the ~20k encoder tokens (the dominant activation at
high resolution) over a `seq` mesh axis, the TPU way:

  * token-major activations [B, S, E] carry a
    ``with_sharding_constraint(P("data", "seq", None))`` — XLA then keeps
    every elementwise op, LayerNorm, and FFN matmul partitioned over tokens
    and inserts the (ICI) collectives only where the math needs them;
  * the deformable-attention gather is query-sharded via ``shard_map``:
    sampling locations/weights are split over `seq`, while the value table —
    which any query may sample anywhere (data-dependent bilinear lookups) —
    is all-gathered per layer (a ~10 MB bf16 table per image at 800px, cheap
    on ICI compared to sharding 8x that in activations).

Activation is a trace-time context (like the env-gated kernel variants):

    with sp.sequence_parallel(mesh):
        step = jax.jit(train_step)
        step(params, opt_state, batch)   # traced with SP constraints

Off (the default) every hook is a no-op — zero cost to the single-chip path.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STACK: list = []

SEQ_AXIS = "seq"


@contextmanager
def sequence_parallel(mesh: Mesh):
    """Enable sequence-parallel tracing. ``mesh`` must have a `seq` axis of
    size > 1 (a size-1 axis makes every hook a no-op)."""
    if SEQ_AXIS not in mesh.axis_names:
        raise ValueError(
            f"mesh {mesh.axis_names} has no '{SEQ_AXIS}' axis; build it with "
            "make_mesh(..., seq=N)"
        )
    _STACK.append(mesh)
    try:
        yield
    finally:
        _STACK.pop()


def active_mesh() -> Optional[Mesh]:
    m = _STACK[-1] if _STACK else None
    if m is not None and m.shape[SEQ_AXIS] <= 1:
        return None
    return m


def _data_axis(mesh: Mesh, b: int) -> Optional[str]:
    if "data" in mesh.axis_names and mesh.shape["data"] > 1 and b % mesh.shape["data"] == 0:
        return "data"
    return None


def constrain_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """Pin a token-major activation [B, S, ...] to (data, seq) sharding.

    No-op outside a ``sequence_parallel`` context. GSPMD handles S not
    divisible by the axis size (it pads internally), so this is safe on any
    level geometry.
    """
    mesh = active_mesh()
    if mesh is None or x.ndim < 2:
        return x
    spec = P(_data_axis(mesh, x.shape[0]), SEQ_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def msda_query_sharded(
    value: jnp.ndarray,  # [B, S, H, hd]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,  # [B, Q, H, L, K, 2]
    attention_weights: jnp.ndarray,  # [B, Q, H, L, K]
    impl: str = "xla",
) -> jnp.ndarray:
    """Deformable attention with queries sharded over `seq`.

    Queries are independent given the value table, so the op shards
    perfectly along Q; the table is replicated into each seq shard (XLA
    emits one all-gather at the shard_map boundary). Q is zero-padded to a
    multiple of the axis size — padded rows carry zero attention weights,
    so their (sliced-off) outputs never feed back.

    Falls back to the plain op outside a ``sequence_parallel`` context.
    """
    from ziragroundingdino_tpu.ops.msda import multi_scale_deformable_attention

    mesh = active_mesh()
    if mesh is None:
        return multi_scale_deformable_attention(
            value, spatial_shapes, sampling_locations, attention_weights, impl=impl
        )

    n = mesh.shape[SEQ_AXIS]
    b, q = sampling_locations.shape[:2]
    pad = (-q) % n
    if pad:
        sampling_locations = jnp.pad(
            sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4
        )
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3
        )
    data_ax = _data_axis(mesh, b)

    def body(v, loc, w):
        return multi_scale_deformable_attention(
            v, spatial_shapes, loc, w, impl=impl
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_ax), P(data_ax, SEQ_AXIS), P(data_ax, SEQ_AXIS)),
        out_specs=P(data_ax, SEQ_AXIS),
        check_vma=False,
    )(value, sampling_locations, attention_weights)
    return out[:, :q] if pad else out
