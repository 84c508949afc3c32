"""Pipeline parallelism over the feature-enhancer (encoder) stack.

The reference has NO pipeline parallelism — it scales by DDP only
(`train_net.py:75-131`; SURVEY §2.5 marks PP "none required for parity").
This module goes beyond parity with a TPU-native GPipe over the encoder
layers, expressed entirely in GSPMD (no manual collectives):

  * per-layer parameter subtrees (``fusion_layers_i`` / ``text_layers_i`` /
    ``layers_i``) are stacked to a leading layer dim and sharded over a
    ``pipe`` mesh axis — each device holds ``enc_layers / pipe`` layers;
  * the pipeline state is a ``[pipe, microbatch, ...]`` array pinned to the
    ``pipe`` axis; one GPipe step is ``vmap``\\ (stage-chain) over the stage
    dim followed by ``jnp.roll(state, 1, axis=0)`` — XLA lowers the roll of
    a pipe-sharded dim to a nearest-neighbour ``collective-permute`` on ICI;
  * microbatches are injected at stage 0 and collected at stage ``P-1``
    inside one ``lax.scan`` of ``M + P - 1`` steps (the classic GPipe
    bubble); invalid slots compute on zeros and are discarded by ``where``.

The encoder is the right (and only) pipeline target in this model: its
~20k-token activations dominate memory, while backbone/decoder/heads stay
replicated (they are small). Activation is a trace-time context like
``sp.sequence_parallel``:

    with pp.pipeline_parallel(mesh, microbatches=4):
        step = jax.jit(train_step)
        step(params, opt_state, batch)

Off (the default) the hook in ``FeatureEnhancer`` is a no-op. PP composes
with the ``data`` and ``model`` axes (batch reductions such as the adapter
self-KD mean stay GSPMD-managed) but not with ``seq`` — sequence and
pipeline parallelism shard the same activations two different ways, and
this module asserts the ``seq`` context is off.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"

_STACK: list = []


@contextmanager
def pipeline_parallel(mesh: Mesh, microbatches: Optional[int] = None):
    """Enable pipeline-parallel tracing. ``mesh`` needs a `pipe` axis of
    size > 1; ``microbatches`` defaults to the pipe axis size (GPipe M=P).
    The batch must be divisible by ``microbatches``."""
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(
            f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' axis; build it "
            "with make_mesh(..., pipe=N)"
        )
    _STACK.append((mesh, microbatches))
    try:
        yield
    finally:
        _STACK.pop()


def active() -> Optional[Tuple[Mesh, Optional[int]]]:
    if not _STACK:
        return None
    mesh, m = _STACK[-1]
    if mesh.shape[PIPE_AXIS] <= 1:
        return None
    return mesh, m


def _pin(mesh: Mesh, x: jnp.ndarray, *lead: Optional[str]) -> jnp.ndarray:
    spec = P(*lead, *([None] * (x.ndim - len(lead))))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _stack_layers(pvars, fmt: str, n: int):
    subtrees = [pvars[fmt.format(i)] for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *subtrees)


def pipelined_enhancer(
    m,  # the bound FeatureEnhancer module (models/transformer.py)
    src: jnp.ndarray,  # [B, S, E]
    pos: jnp.ndarray,  # [B, S, E]
    reference_points: jnp.ndarray,  # [B, S, L, 2]
    spatial_shapes,  # static tuple
    key_padding_mask: jnp.ndarray,  # [B, S]
    text: jnp.ndarray,  # [B, T, E]
    text_token_mask: jnp.ndarray,  # [B, T]
    text_self_attention_masks: jnp.ndarray,  # [B, T, T]
    pos_text: Optional[jnp.ndarray],  # [B, T, E] or None
    deterministic: bool,
):
    """GPipe forward of the encoder stack; numerically equal to the
    sequential layer loop (per-microbatch means of the adapter self-KD loss
    average exactly to the full-batch mean for equal microbatch sizes)."""
    from ziragroundingdino_tpu.models.fusion import BiAttentionBlock
    from ziragroundingdino_tpu.models.transformer import (
        DeformableEncoderLayer,
        TextEnhancerLayer,
    )
    from ziragroundingdino_tpu.parallel import sp

    assert sp.active_mesh() is None, (
        "sequence_parallel and pipeline_parallel are mutually exclusive "
        "(they shard the same token activations)"
    )
    mesh, m_req = active()
    cfg = m.cfg
    n_pipe = mesh.shape[PIPE_AXIS]
    n_layers = cfg.enc_layers
    if n_layers % n_pipe:
        raise ValueError(f"enc_layers={n_layers} not divisible by pipe={n_pipe}")
    chunk = n_layers // n_pipe

    b = src.shape[0]
    n_micro = min(m_req or n_pipe, b)
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by microbatches={n_micro}")
    bm = b // n_micro

    pvars = m.variables["params"]
    layer_p = _stack_layers(pvars, "layers_{}", n_layers)
    fusion_p = (_stack_layers(pvars, "fusion_layers_{}", n_layers)
                if cfg.use_fusion_layer else {})
    text_p = (_stack_layers(pvars, "text_layers_{}", n_layers)
              if cfg.use_text_enhancer else {})
    # [n_layers, ...] -> [n_pipe, chunk, ...]
    def _fold(t):
        return jax.tree_util.tree_map(
            lambda a: _pin(mesh, a.reshape(n_pipe, chunk, *a.shape[1:]),
                           PIPE_AXIS), t)

    layer_p, fusion_p, text_p = _fold(layer_p), _fold(fusion_p), _fold(text_p)

    fusion_mod = BiAttentionBlock(
        v_dim=cfg.hidden_dim, l_dim=cfg.hidden_dim,
        embed_dim=cfg.dim_feedforward // 2, num_heads=cfg.nheads // 2,
        dropout=cfg.fusion_dropout, drop_path=cfg.fusion_droppath,
        dtype=m.dtype)
    text_mod = TextEnhancerLayer(cfg, dtype=m.dtype)
    layer_mod = DeformableEncoderLayer(cfg, dtype=m.dtype)

    need_rng = (not deterministic) and (
        cfg.fusion_dropout > 0 or cfg.fusion_droppath > 0 or cfg.text_dropout > 0
    )
    base_rng = m.make_rng("dropout") if need_rng else None

    def micro(x):  # [B, ...] -> [M, bm, ...], microbatch-major
        return _pin(mesh, x.reshape(n_micro, bm, *x.shape[1:]), None, "data")

    src_mb, text_mb = micro(src), micro(text)
    inv = {
        "pos": micro(pos),
        "ref": micro(reference_points),
        "kpm": micro(key_padding_mask),
        "tmask": micro(text_token_mask),
        "tattn": micro(text_self_attention_masks),
    }
    if pos_text is not None:
        inv["pos_text"] = micro(pos_text)

    def chain(params3, state, inv_1, stage_id, m_idx):
        """One pipeline stage: `chunk` enhancer blocks on one microbatch."""
        lp, fp, tp = params3
        s, t, al = state

        def block(carry, c):
            s, t, al = carry
            rngs = None
            if base_rng is not None:
                layer_id = stage_id * chunk + c
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.fold_in(base_rng, layer_id * 4096 + m_idx), 0)}
            if cfg.use_fusion_layer:
                s, t = fusion_mod.apply(
                    {"params": jax.tree_util.tree_map(lambda a: a[c], fp)},
                    s, t, inv_1["kpm"], inv_1["tmask"], deterministic,
                    rngs=rngs)
            if cfg.use_text_enhancer:
                t = text_mod.apply(
                    {"params": jax.tree_util.tree_map(lambda a: a[c], tp)},
                    t, inv_1["tattn"], inv_1.get("pos_text"), deterministic,
                    rngs=rngs)
            s, a = layer_mod.apply(
                {"params": jax.tree_util.tree_map(lambda a: a[c], lp)},
                s, inv_1["pos"], inv_1["ref"], spatial_shapes, inv_1["kpm"],
                deterministic, rngs=rngs)
            return (s, t, al + a), None

        fn = block
        if cfg.use_transformer_ckpt or cfg.use_checkpoint:
            fn = jax.checkpoint(block, static_argnums=(1,))
        for c in range(chunk):
            s, t, al = fn((s, t, al), c)[0]
        return s, t, al

    vchain = jax.vmap(chain, in_axes=((0, 0, 0), 0, 0, 0, 0))

    stage_ids = jnp.arange(n_pipe)
    zeros_s = jnp.zeros((n_pipe,) + src_mb.shape[1:], src_mb.dtype)
    zeros_t = jnp.zeros((n_pipe,) + text_mb.shape[1:], text_mb.dtype)
    state0 = (
        _pin(mesh, zeros_s, PIPE_AXIS, "data"),
        _pin(mesh, zeros_t, PIPE_AXIS, "data"),
        jnp.zeros((n_pipe,), jnp.float32),
    )
    out0 = (
        jnp.zeros_like(src_mb),
        jnp.zeros_like(text_mb),
        jnp.zeros((n_micro,), jnp.float32),
    )

    def step(carry, t_):
        (s, t, al), (o_s, o_t, o_al) = carry
        # shift the pipe: stage p receives stage p-1's state (nearest-
        # neighbour collective-permute on the pipe-sharded dim 0)
        s, t, al = (jnp.roll(x, 1, axis=0) for x in (s, t, al))
        # inject microbatch t_ at stage 0 (zeros once the queue drains)
        live = t_ < n_micro
        idx_in = jnp.clip(t_, 0, n_micro - 1)
        s = s.at[0].set(jnp.where(
            live, jax.lax.dynamic_index_in_dim(src_mb, idx_in, 0, False), 0.0))
        t = t.at[0].set(jnp.where(
            live, jax.lax.dynamic_index_in_dim(text_mb, idx_in, 0, False), 0.0))
        al = al.at[0].set(0.0)
        s = _pin(mesh, s, PIPE_AXIS, "data")
        t = _pin(mesh, t, PIPE_AXIS, "data")
        # per-stage invariant slices: stage p works on microbatch t_ - p
        m_idx = jnp.clip(t_ - stage_ids, 0, n_micro - 1)
        inv_sel = jax.tree_util.tree_map(
            lambda a: _pin(mesh, jnp.take(a, m_idx, axis=0), PIPE_AXIS, "data"),
            inv)
        s, t, al = vchain((layer_p, fusion_p, text_p), (s, t, al),
                          inv_sel, stage_ids, m_idx)
        s = _pin(mesh, s, PIPE_AXIS, "data")
        t = _pin(mesh, t, PIPE_AXIS, "data")
        # collect stage P-1's finished microbatch t_ - (P-1)
        m_out = t_ - (n_pipe - 1)
        ok = (m_out >= 0) & (m_out < n_micro)
        idx_out = jnp.clip(m_out, 0, n_micro - 1)
        o_s = jnp.where(ok, jax.lax.dynamic_update_index_in_dim(
            o_s, s[n_pipe - 1], idx_out, 0), o_s)
        o_t = jnp.where(ok, jax.lax.dynamic_update_index_in_dim(
            o_t, t[n_pipe - 1], idx_out, 0), o_t)
        o_al = jnp.where(ok, o_al.at[idx_out].set(al[n_pipe - 1]), o_al)
        return ((s, t, al), (o_s, o_t, o_al)), None

    (_, (o_s, o_t, o_al)), _ = jax.lax.scan(
        step, (state0, out0), jnp.arange(n_micro + n_pipe - 1))

    src_out = o_s.reshape(b, *o_s.shape[2:])
    text_out = o_t.reshape(b, *o_t.shape[2:])
    # sum over layers of per-layer full-batch means == mean over equal-size
    # microbatches of the per-chain sums
    adapter_loss = jnp.mean(o_al)
    return src_out, text_out, adapter_loss
