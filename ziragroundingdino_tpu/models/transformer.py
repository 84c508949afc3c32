"""Feature-enhancer encoder + cross-modality decoder (deformable DETR core).

Capability parity with `models/GroundingDINO/transformer_for_adapter.py`:
  * `MSDeformAttn` module (value/offset/weight/output projections around the
    sampling kernel)                        — `ms_deform_attn.py:133-354`
  * `DeformableEncoderLayer`                — `transformer_for_adapter.py:809-907`
  * `TextEnhancerLayer` (vanilla TEL)       — `transformer_vanilla.py:72-123`
  * `FeatureEnhancer` (fusion+text+deform)  — `transformer_for_adapter.py:423-662`
  * `DeformableDecoderLayer` (self/ca_text/deform/FFN) — `:910-1073`
  * `CrossModalityDecoder` (conditional queries, box refinement) — `:665-806`
  * `Transformer` w/ two-stage language-guided query selection — `:228-421`
  * `gen_encoder_output_proposals`          — `utils.py:56-116`

TPU-first design:
  * batch-first everywhere (the reference flips to seq-first for decoder);
  * `spatial_shapes` are static python tuples — one compile per shape bucket,
    no dynamic level indexing;
  * layer loops are unrolled python loops over 6 distinct layer modules (XLA
    pipelines them; `lax.scan` would force parameter stacking that breaks
    checkpoint-key fidelity and saves nothing at 6 iterations);
  * masks are True = valid; softmaxes in fp32; decoder FFN in fp32 mirroring
    the reference's autocast-disabled region (`transformer_for_adapter.py:1004`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.config import GroundingDINOConfig
from ziragroundingdino_tpu.models.layers import (
    MLP,
    Dense,
    LayerNorm,
    MultiHeadAttention,
    NEG_INF,
    activation_fn,
    gen_sineembed_for_position,
    get_sine_pos_embed,
    inverse_sigmoid,
)
from ziragroundingdino_tpu.models.fusion import BiAttentionBlock
from ziragroundingdino_tpu.parallel import pp, sp

SpatialShapes = Tuple[Tuple[int, int], ...]


def _sampling_offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Reference init (`ms_deform_attn.py:203-217`): per-head unit directions
    on a compass, scaled by point index."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * np.pi / num_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
        for i in range(num_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (`ms_deform_attn.py:133-354`)."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    impl: str = "xla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, E] (pos already added by caller)
        value: jnp.ndarray,  # [B, S, E]
        reference_points: jnp.ndarray,  # [B, Q, L, 2] or [B, Q, L, 4], in [0,1]
        spatial_shapes: SpatialShapes,
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True=valid
    ) -> jnp.ndarray:
        h, l, p = self.num_heads, self.num_levels, self.num_points
        e = self.embed_dim
        hd = e // h
        b, q, _ = query.shape
        s = value.shape[1]
        cd = self.dtype or query.dtype

        value = Dense(e, dtype=cd, kernel_init=nn.initializers.xavier_uniform(),
                      bias_init=nn.initializers.zeros, name="value_proj")(value)
        if key_padding_mask is not None:
            value = jnp.where(key_padding_mask[..., None], value, 0.0)
        value = value.reshape(b, s, h, hd)

        offsets = Dense(
            h * l * p * 2, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(h, l, p),
            name="sampling_offsets",
        )(query).reshape(b, q, h, l, p, 2)
        weights = Dense(
            h * l * p, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, q, h, l * p)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).reshape(b, q, h, l, p)

        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (w, h)
            wh = jnp.asarray([(w_, h_) for h_, w_ in spatial_shapes], dtype=jnp.float32)
            loc = reference_points[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        # query-sharded under an active sequence_parallel context (the value
        # table is all-gathered per layer); identical to the plain op when off
        out = sp.msda_query_sharded(
            value, spatial_shapes, loc, weights, impl=self.impl
        )
        return Dense(e, dtype=cd, kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    """`transformer_for_adapter.py:809-907` (adapter hook optional)."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, S, E]
        pos: jnp.ndarray,  # [B, S, E]
        reference_points: jnp.ndarray,  # [B, S, L, 2]
        spatial_shapes: SpatialShapes,
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        src2 = MSDeformAttn(
            embed_dim=cfg.hidden_dim, num_heads=cfg.nheads,
            num_levels=cfg.num_feature_levels, num_points=cfg.enc_n_points,
            impl=cfg.msda_impl, dtype=self.dtype, name="self_attn",
        )(src + pos, src, reference_points, spatial_shapes, key_padding_mask)
        src = LayerNorm(name="norm1")(src + src2).astype(src2.dtype)

        adapter_loss = jnp.zeros((), jnp.float32)
        adapter_out = None
        if cfg.use_adapter:
            from ziragroundingdino_tpu.models.adapters import Adapter

            adapter_out, adapter_loss = Adapter(
                embed_dim=cfg.hidden_dim, down_dim=64,
                gate_base_scale=cfg.encoder_gate_base_scale,
                use_self_kd=cfg.use_self_kd, dtype=self.dtype, name="adapter",
            )(src, deterministic)

        act = activation_fn(cfg.transformer_activation)
        y = Dense(cfg.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        y = act(y)
        y = Dense(cfg.hidden_dim, dtype=self.dtype, name="linear2")(y)
        src = src + y
        if adapter_out is not None:
            src = src + adapter_out
        src = LayerNorm(name="norm2")(src).astype(y.dtype)
        return src, adapter_loss


class TextEnhancerLayer(nn.Module):
    """Vanilla transformer encoder layer over text (`transformer_vanilla.py:72-123`).
    nheads//2 heads, ffn//2 wide (`transformer_for_adapter.py:101-107`)."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # [B, T, E]
        attn_mask: jnp.ndarray,  # [B, T, T] True=attend
        pos: Optional[jnp.ndarray],  # [B, T, E]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        q = text if pos is None else text + pos
        attn = MultiHeadAttention(
            num_heads=cfg.nheads // 2, dropout=cfg.text_dropout, dtype=self.dtype,
            name="self_attn",
        )(q, q, text, attn_mask=attn_mask, deterministic=deterministic)
        text = LayerNorm(name="norm1")(text + attn).astype(attn.dtype)
        y = Dense(cfg.dim_feedforward // 2, dtype=self.dtype, name="linear1")(text)
        y = jax.nn.relu(y)
        y = Dense(cfg.hidden_dim, dtype=self.dtype, name="linear2")(y)
        return LayerNorm(name="norm2")(text + y).astype(y.dtype)


def encoder_reference_points(
    spatial_shapes: SpatialShapes, valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """Per-pixel normalized reference points (`transformer_for_adapter.py:483-498`).
    valid_ratios: [B, L, 2] (w_ratio, h_ratio). Returns [B, S, L, 2]."""
    ref_list = []
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        ry = (jnp.arange(h_l, dtype=jnp.float32) + 0.5)[:, None]  # [h,1]
        rx = (jnp.arange(w_l, dtype=jnp.float32) + 0.5)[None, :]  # [1,w]
        ry = jnp.broadcast_to(ry, (h_l, w_l)).reshape(-1)
        rx = jnp.broadcast_to(rx, (h_l, w_l)).reshape(-1)
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * h_l)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * w_l)
        ref_list.append(jnp.stack((rx, ry), -1))  # [B, hw, 2]
    ref = jnp.concatenate(ref_list, axis=1)  # [B, S, 2]
    return ref[:, :, None] * valid_ratios[:, None]  # [B, S, L, 2]


def compute_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[B, L, 2] (w, h) valid fractions per level (`transformer_for_adapter.py:216-224`).
    masks: per-level [B, h, w] True=valid."""
    ratios = []
    for m in masks:
        _, h, w = m.shape
        valid_h = jnp.sum(m[:, :, 0].astype(jnp.float32), axis=1)
        valid_w = jnp.sum(m[:, 0, :].astype(jnp.float32), axis=1)
        ratios.append(jnp.stack([valid_w / w, valid_h / h], -1))
    return jnp.stack(ratios, axis=1)


def gen_encoder_output_proposals(
    memory: jnp.ndarray,  # [B, S, E]
    memory_mask: jnp.ndarray,  # [B, S] True=valid
    spatial_shapes: SpatialShapes,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor proposals per memory pixel (`utils.py:56-116`). Returns
    (masked memory, unsigmoided proposals [B, S, 4]). Invalid positions get a
    large finite logit (reference uses inf; finite keeps grads NaN-free,
    sigmoid saturates to 1.0 identically)."""
    b = memory.shape[0]
    proposals = []
    start = 0
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        m = memory_mask[:, start : start + h_l * w_l].reshape(b, h_l, w_l)
        start += h_l * w_l
        valid_h = jnp.sum(m[:, :, 0].astype(jnp.float32), axis=1)  # [B]
        valid_w = jnp.sum(m[:, 0, :].astype(jnp.float32), axis=1)

        gy = jnp.arange(h_l, dtype=jnp.float32)[:, None]
        gx = jnp.arange(w_l, dtype=jnp.float32)[None, :]
        grid = jnp.stack(
            (jnp.broadcast_to(gx, (h_l, w_l)), jnp.broadcast_to(gy, (h_l, w_l))), -1
        )  # [h, w, 2]
        scale = jnp.stack([valid_w, valid_h], -1).reshape(b, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale  # [B, h, w, 2]
        wh = jnp.ones_like(grid) * 0.05 * (2.0**lvl)
        proposals.append(jnp.concatenate((grid, wh), -1).reshape(b, -1, 4))

    props = jnp.concatenate(proposals, axis=1).astype(jnp.float32)  # [B, S, 4]
    valid = jnp.all((props > 0.01) & (props < 0.99), axis=-1, keepdims=True)
    props = jnp.log(props / jnp.clip(1.0 - props, 1e-9))  # unsigmoid
    keep = memory_mask[..., None] & valid
    props = jnp.where(keep, props, 1.0e6)
    mem = jnp.where(keep, memory, 0.0).astype(memory.dtype)
    return mem, props


class FeatureEnhancer(nn.Module):
    """The encoder stack: per layer fusion -> text TEL -> deformable
    (`transformer_for_adapter.py:563-661`)."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, S, E]
        pos: jnp.ndarray,  # [B, S, E]
        spatial_shapes: SpatialShapes,
        valid_ratios: jnp.ndarray,
        key_padding_mask: jnp.ndarray,  # [B, S] True=valid
        text: jnp.ndarray,  # [B, T, E]
        text_token_mask: jnp.ndarray,  # [B, T] True=valid
        text_self_attention_masks: jnp.ndarray,  # [B, T, T] True=attend
        position_ids: jnp.ndarray,  # [B, T]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        reference_points = encoder_reference_points(spatial_shapes, valid_ratios)
        pos_text = None
        if cfg.use_text_enhancer:
            # num_pos_feats = d_model (reference hardcodes 256,
            # `transformer_for_adapter.py:551-554`)
            pos_text = get_sine_pos_embed(
                position_ids[..., None].astype(jnp.float32),
                num_pos_feats=cfg.hidden_dim, exchange_xy=False,
            ).astype(src.dtype)

        # under pipeline_parallel (parallel/pp.py): GPipe the layer stack
        # over the `pipe` mesh axis instead of the sequential loop. Params
        # must already exist, so init still takes the loop below.
        if pp.active() is not None and not self.is_initializing():
            return pp.pipelined_enhancer(
                self, src, pos, reference_points, spatial_shapes,
                key_padding_mask, text, text_token_mask,
                text_self_attention_masks, pos_text, deterministic,
            )

        adapter_loss = jnp.zeros((), jnp.float32)
        layer_cls = DeformableEncoderLayer
        if cfg.use_transformer_ckpt:
            layer_cls = nn.remat(DeformableEncoderLayer, static_argnums=(4, 6))
        fusion_cls = BiAttentionBlock
        if cfg.use_checkpoint:
            fusion_cls = nn.remat(BiAttentionBlock, static_argnums=(5,))

        for i in range(cfg.enc_layers):
            # under sequence_parallel: pin the ~20k-token activation to the
            # seq axis so LN/FFN/projections stay token-sharded (no-op when off)
            src = sp.constrain_tokens(src)
            if cfg.use_fusion_layer:
                src, text = fusion_cls(
                    v_dim=cfg.hidden_dim, l_dim=cfg.hidden_dim,
                    embed_dim=cfg.dim_feedforward // 2, num_heads=cfg.nheads // 2,
                    dropout=cfg.fusion_dropout, drop_path=cfg.fusion_droppath,
                    dtype=self.dtype, name=f"fusion_layers_{i}",
                )(src, text, key_padding_mask, text_token_mask, deterministic)
            if cfg.use_text_enhancer:
                text = TextEnhancerLayer(cfg, dtype=self.dtype, name=f"text_layers_{i}")(
                    text, text_self_attention_masks, pos_text, deterministic
                )
            src, al = layer_cls(cfg, dtype=self.dtype, name=f"layers_{i}")(
                src, pos, reference_points, spatial_shapes, key_padding_mask, deterministic
            )
            adapter_loss = adapter_loss + al
        return src, text, adapter_loss


class DeformableDecoderLayer(nn.Module):
    """`transformer_for_adapter.py:910-1073`: self-attn -> text cross-attn ->
    deformable cross-attn -> fp32 FFN."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Q, E]
        query_pos: jnp.ndarray,  # [B, Q, E]
        reference_points_input: jnp.ndarray,  # [B, Q, L, 4]
        memory: jnp.ndarray,  # [B, S, E]
        memory_mask: jnp.ndarray,  # [B, S] True=valid
        spatial_shapes: SpatialShapes,
        text: jnp.ndarray,  # [B, T, E]
        text_token_mask: jnp.ndarray,  # [B, T] True=valid
        self_attn_mask: Optional[jnp.ndarray] = None,  # [B, Q, Q] True=attend
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        q = tgt + query_pos
        attn = MultiHeadAttention(
            num_heads=cfg.nheads, dropout=cfg.dropout, dtype=self.dtype, name="self_attn",
        )(q, q, tgt, attn_mask=self_attn_mask, deterministic=deterministic)
        tgt = LayerNorm(name="norm2")(tgt + attn).astype(attn.dtype)

        if cfg.use_text_cross_attention:
            attn = MultiHeadAttention(
                num_heads=cfg.nheads, dropout=cfg.dropout, dtype=self.dtype, name="ca_text",
            )(tgt + query_pos, text, text, key_padding_mask=text_token_mask,
              deterministic=deterministic)
            tgt = LayerNorm(name="catext_norm")(tgt + attn).astype(attn.dtype)

        attn = MSDeformAttn(
            embed_dim=cfg.hidden_dim, num_heads=cfg.nheads,
            num_levels=cfg.num_feature_levels, num_points=cfg.dec_n_points,
            impl=cfg.msda_impl, dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, memory, reference_points_input, spatial_shapes, memory_mask)
        tgt = LayerNorm(name="norm1")(tgt + attn).astype(attn.dtype)

        adapter_loss = jnp.zeros((), jnp.float32)
        adapter_out = None
        if cfg.use_adapter:
            from ziragroundingdino_tpu.models.adapters import Adapter

            adapter_out, adapter_loss = Adapter(
                embed_dim=cfg.hidden_dim, down_dim=64,
                gate_base_scale=cfg.decoder_gate_base_scale,
                use_self_kd=cfg.use_self_kd, dtype=jnp.float32, name="adapter",
            )(tgt, deterministic)

        # FFN in fp32 (reference disables autocast here, :1004)
        act = activation_fn(cfg.transformer_activation)
        y = Dense(cfg.dim_feedforward, dtype=jnp.float32, name="linear1")(tgt)
        y = act(y)
        y = Dense(cfg.hidden_dim, dtype=jnp.float32, name="linear2")(y)
        tgt = tgt.astype(jnp.float32) + y
        if adapter_out is not None:
            tgt = tgt + adapter_out
        tgt = LayerNorm(name="norm3")(tgt).astype(self.dtype or y.dtype)
        return tgt, adapter_loss


class CrossModalityDecoder(nn.Module):
    """Decoder stack with conditional queries + iterative box refinement
    (`transformer_for_adapter.py:665-806`). The box head (`bbox_embed`) is
    owned by the parent model and passed in as a module list, mirroring the
    reference's shared-head wiring (`groundingdino.py:188-191`)."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Q, E]
        refpoints_unsigmoid: jnp.ndarray,  # [B, Q, 4]
        memory: jnp.ndarray,
        memory_mask: jnp.ndarray,
        spatial_shapes: SpatialShapes,
        valid_ratios: jnp.ndarray,  # [B, L, 2]
        text: jnp.ndarray,
        text_token_mask: jnp.ndarray,
        bbox_embed,  # callable: (layer_id, x) -> [B, Q, 4] delta
        self_attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        output = tgt
        reference_points = jax.nn.sigmoid(refpoints_unsigmoid.astype(jnp.float32))
        intermediate = []
        ref_points = [reference_points]
        adapter_loss = jnp.zeros((), jnp.float32)

        # shared across layers, like the reference's single ref_point_head /
        # decoder norm (`transformer_for_adapter.py:689,735`)
        ref_point_head = MLP(
            hidden_dim=cfg.hidden_dim, output_dim=cfg.hidden_dim, num_layers=2,
            dtype=self.dtype, name="ref_point_head",
        )
        final_norm = LayerNorm(name="norm")

        for i in range(cfg.dec_layers):
            ref_input = (
                reference_points[:, :, None]
                * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]
            )  # [B, Q, L, 4]
            query_sine = gen_sineembed_for_position(
                ref_input[:, :, 0, :], num_feats=cfg.hidden_dim // 2
            )  # [B, Q, 2*d_model]
            query_pos = ref_point_head(query_sine.astype(self.dtype or output.dtype))

            output, al = DeformableDecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                output, query_pos, ref_input, memory, memory_mask, spatial_shapes,
                text, text_token_mask, self_attn_mask, deterministic,
            )
            adapter_loss = adapter_loss + al

            delta = bbox_embed(i, output).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            reference_points = jax.lax.stop_gradient(new_ref)
            ref_points.append(new_ref)
            intermediate.append(final_norm(output))

        return intermediate, ref_points, adapter_loss


class Transformer(nn.Module):
    """Full encoder-decoder with two-stage language-guided query selection
    (`transformer_for_adapter.py:228-421`). `class_embed`/`bbox_embed`
    callables come from the parent (ContrastiveEmbed has no params; box MLP
    params are shared with the per-layer heads)."""

    cfg: GroundingDINOConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        srcs: Sequence[jnp.ndarray],  # per level [B, h, w, E]
        masks: Sequence[jnp.ndarray],  # per level [B, h, w] True=valid
        pos_embeds: Sequence[jnp.ndarray],  # per level [B, h, w, E]
        text_dict: dict,
        enc_class_embed,  # callable: (memory, text_dict) -> [B, S, max_text]
        enc_bbox_embed,  # callable: x -> [B, S, 4]
        bbox_embed,  # callable: (layer_id, x) -> [B, Q, 4]
        deterministic: bool = True,
    ):
        cfg = self.cfg
        b = srcs[0].shape[0]
        cd = self.dtype or srcs[0].dtype

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (cfg.num_feature_levels, cfg.hidden_dim),
        )

        src_flat, mask_flat, pos_flat, spatial_shapes = [], [], [], []
        for lvl, (src, mask, pos) in enumerate(zip(srcs, masks, pos_embeds)):
            _, h, w, e = src.shape
            spatial_shapes.append((h, w))
            src_flat.append(src.reshape(b, h * w, e))
            mask_flat.append(mask.reshape(b, h * w))
            pos_flat.append(
                pos.reshape(b, h * w, e).astype(cd) + level_embed[lvl].astype(cd)
            )
        src_flat = jnp.concatenate(src_flat, axis=1)
        mask_flat = jnp.concatenate(mask_flat, axis=1)
        pos_flat = jnp.concatenate(pos_flat, axis=1)
        spatial_shapes = tuple(spatial_shapes)
        valid_ratios = compute_valid_ratios(masks)

        memory, memory_text, enc_adapter_loss = FeatureEnhancer(
            cfg, dtype=self.dtype, name="encoder",
        )(
            src_flat, pos_flat, spatial_shapes, valid_ratios, mask_flat,
            text_dict["encoded_text"], text_dict["text_token_mask"],
            text_dict["text_self_attention_masks"], text_dict["position_ids"],
            deterministic,
        )
        text_dict = dict(text_dict, encoded_text=memory_text)

        # ---- two-stage query selection (`transformer_for_adapter.py:301-344`)
        output_memory, output_proposals = gen_encoder_output_proposals(
            memory, mask_flat, spatial_shapes
        )
        output_memory = Dense(cfg.hidden_dim, dtype=cd, name="enc_output")(output_memory)
        output_memory = LayerNorm(name="enc_output_norm")(output_memory).astype(cd)

        enc_logits = enc_class_embed(output_memory, text_dict)  # [B, S, max_text]
        topk_logits = jnp.max(enc_logits, axis=-1)  # [B, S]
        enc_coords = enc_bbox_embed(output_memory).astype(jnp.float32) + output_proposals

        topk = cfg.num_queries
        s_total = topk_logits.shape[1]
        if s_total >= topk:
            _, topk_idx = jax.lax.top_k(topk_logits, topk)  # [B, K]
        else:
            # degenerate tiny-image case (fewer pixels than queries): take
            # everything and cycle — keeps static shapes, harmless duplicates
            _, idx_all = jax.lax.top_k(topk_logits, s_total)
            reps = -(-topk // s_total)
            topk_idx = jnp.tile(idx_all, (1, reps))[:, :topk]

        refpoint_embed_undetach = jnp.take_along_axis(
            enc_coords, topk_idx[..., None], axis=1
        )  # [B, K, 4]
        refpoint_embed = jax.lax.stop_gradient(refpoint_embed_undetach)
        init_box_proposal = jax.nn.sigmoid(
            jnp.take_along_axis(output_proposals, topk_idx[..., None], axis=1)
        )
        tgt_undetach = jnp.take_along_axis(
            output_memory, topk_idx[..., None], axis=1
        )  # [B, K, E]

        if cfg.embed_init_tgt:
            tgt_embed = self.param(
                "tgt_embed", nn.initializers.normal(1.0), (cfg.num_queries, cfg.hidden_dim)
            )
            tgt = jnp.broadcast_to(tgt_embed[None], (b, topk, cfg.hidden_dim)).astype(cd)
        else:
            tgt = jax.lax.stop_gradient(tgt_undetach)

        intermediate, ref_points, dec_adapter_loss = CrossModalityDecoder(
            cfg, dtype=self.dtype, name="decoder",
        )(
            tgt, refpoint_embed, memory, mask_flat, spatial_shapes, valid_ratios,
            text_dict["encoded_text"], text_dict["text_token_mask"], bbox_embed,
            None, deterministic,
        )

        hs_enc = tgt_undetach
        ref_enc = jax.nn.sigmoid(refpoint_embed_undetach)
        return {
            "hidden_states": intermediate,  # list of [B, Q, E]
            "references": ref_points,  # list of [B, Q, 4] sigmoided
            "memory_text": text_dict["encoded_text"],
            "hs_enc": hs_enc,
            "ref_enc": ref_enc,
            "init_box_proposal": init_box_proposal,
            "adapter_loss": enc_adapter_loss + dec_adapter_loss,
        }
