"""GroundingDINO model assembly (flax.linen), all variants in one module.

Capability parity with the reference model family, selected via
`GroundingDINOConfig.modelname` + flags — the same knob surface the SLConfig
registry dispatches on (`models/__init__.py:11-18`):
  * `groundingdino`      — vanilla open-set detector (`groundingdino.py:56-397`)
  * `dtgroundingdino`    — trainable scaffold + PET baselines: CET language
    adapter (`groundingdino_dt.py:182-206`), linear probe / prompt / BERT /
    project tuning flags
  * `dualzerorepbranchgroundingdino` — ZiRa: RepZero dual branches on the
    language path (`groundingdino_dual_zero_rep_branch.py:242-252,460-462`)
    and per-level vision projections (`:290-305,487-529`)
  * `catgroundingdino`   — in-layer encoder/decoder adapters (cfg.use_adapter)

Forward I/O is pure arrays (host tokenization/preprocessing happens in
`ziragroundingdino_tpu.text` / `.data`): NHWC pixels + validity mask +
a text batch of static bucket length. Output `pred_logits` are token-level
[B, Q, max_text_len] like the reference; per-category class logits come from
`text.masks.recover_to_cls_logits`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.config import GroundingDINOConfig
from ziragroundingdino_tpu.models.adapters import Adapter, LinearAdapter, MoeAdapter, TransformerAdapter
from ziragroundingdino_tpu.models.bert import BertEncoder
from ziragroundingdino_tpu.models.heads import ContrastiveEmbed
from ziragroundingdino_tpu.models.layers import MLP, Dense, inverse_sigmoid
from ziragroundingdino_tpu.models.position_encoding import position_embedding_sine_hw
from ziragroundingdino_tpu.models.swin import SwinTransformer, interpolate_mask_nearest
from ziragroundingdino_tpu.models.transformer import Transformer
from ziragroundingdino_tpu.models.zira import (
    RepZeroConv,
    RepZeroConvGN,
    RepZeroLinear,
    RepZeroLoRA,
    ZeroConvBN,
)

# the reparameterizable family (SURVEY §2.2: dual/multilayer/repconv/repconvbn)
ZIRA_MODELNAMES = (
    "dualzerorepbranchgroundingdino",
    "dualzerorepmultilayerbranchgroundingdino",
    "repgroundingdino",
    "repconvbngroundingdino",
)


def _language_adapter(cfg, cd):
    """ZiRa language-side module by variant; None when the variant has no
    language branch (single-branch repconv models)."""
    if cfg.modelname == "dualzerorepbranchgroundingdino":
        if cfg.zira_lan_adapter == "lora":
            # low-rank alternative (`groundingdino_dual_zero_rep_branch.py:
            # 251-253` -> `adapter.py:227-259`)
            return RepZeroLoRA(
                features=cfg.hidden_dim, down_dim=cfg.zira_lora_down_dim,
                scale_init=cfg.zira_lan_scale, zero_value=cfg.zira_zero_init,
                dtype=cd, name="rep_linear_adapter",
            )
        return RepZeroLinear(
            features=cfg.hidden_dim, scale_init=cfg.zira_lan_scale,
            zero_value=cfg.zira_zero_init, dtype=cd, name="rep_linear_adapter",
        )
    if cfg.modelname == "dualzerorepmultilayerbranchgroundingdino":
        # `multilayer_branch.py:322-324`: scaling init 1.0, L1 ZIL
        return RepZeroLinear(
            features=cfg.hidden_dim, scale_init=1.0, zil="l1",
            zero_value=cfg.zira_zero_init, dtype=cd, name="rep_language_adapter",
        )
    return None


def _vision_adapter_cls(cfg):
    return {
        "dualzerorepbranchgroundingdino": RepZeroConv,
        "repgroundingdino": RepZeroConv,
        "dualzerorepmultilayerbranchgroundingdino": RepZeroConvGN,
        "repconvbngroundingdino": ZeroConvBN,
    }[cfg.modelname]


class InputProj(nn.Module):
    """Per-level 1x1 conv (or 3x3/s2 for the extra level) + GroupNorm(32)
    (`groundingdino.py:133-150`)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ks = self.kernel_size
        y = nn.Conv(
            self.features, (ks, ks), strides=(self.stride, self.stride),
            padding=[(ks // 2, ks // 2)] * 2,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv",
        )(x)
        if extra is not None:
            # ZiRa vision branch adds before the norm (`:487-529`)
            y = y + extra
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32)
        )
        return y.astype(self.dtype or x.dtype)


class TextEncoderOnly(nn.Module):
    """Text path only (BERT -> feat_map -> language adapter), with submodule
    names identical to `GroundingDINO`'s so the SAME param tree applies —
    used by prompt-memory construction (`groundingdino_dt.py:379-437`) and
    text-side replay (`:786-838`) without running the image tower."""

    cfg: GroundingDINOConfig

    @nn.compact
    def __call__(self, text: Dict[str, jnp.ndarray], train: bool = False):
        cfg = self.cfg
        cd = jnp.dtype(cfg.compute_dtype)
        is_zira = cfg.modelname in ZIRA_MODELNAMES
        bert_out = BertEncoder(cfg.bert, dtype=cd, name="bert")(
            text["input_ids"],
            text["text_self_attention_masks"] if cfg.sub_sentence_present
            else text["text_token_mask"],
            position_ids=text["position_ids"] if cfg.sub_sentence_present else None,
            deterministic=True,
        )
        encoded_text = Dense(
            cfg.hidden_dim, dtype=cd,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name="feat_map",
        )(bert_out)
        adapter_loss = jnp.zeros((), jnp.float32)
        if cfg.use_cet:
            lang_adapter = _language_adapter(cfg, cd) if is_zira else None
            if lang_adapter is not None:
                rep_out, adapter_loss = lang_adapter(
                    bert_out, train=train, mask=text["text_token_mask"])
                encoded_text = encoded_text + rep_out
            else:
                # single-branch rep variants (repconv/repconvbn) have no
                # language rep branch; with use_cet they build a CET adapter
                # exactly like the dt model (`groundingdino_repconvbn.py:
                # 253-270,473-474`)
                cet_cls = {
                    "Adapter": Adapter, "Linear": LinearAdapter,
                    "Transformer": TransformerAdapter,
                }[cfg.cet_type]
                kw = dict(embed_dim=cfg.bert.hidden_size, output_dim=cfg.hidden_dim,
                          use_self_kd=False, dtype=cd, name="cet_adapter")
                if cfg.cet_type != "Linear":
                    kw["down_dim"] = cfg.cet_middle_dim
                if cfg.cet_type != "Transformer":
                    kw["gate_base_scale"] = 1.0
                cet_out, adapter_loss = cet_cls(**kw)(bert_out, True)
                encoded_text = encoded_text + cet_out
        return encoded_text, adapter_loss


class GroundingDINO(nn.Module):
    cfg: GroundingDINOConfig

    @property
    def compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,  # [B, H, W, 3] normalized fp32
        mask: jnp.ndarray,  # [B, H, W] bool True=valid
        text: Dict[str, jnp.ndarray],  # input_ids, text_token_mask [B,T],
        # position_ids [B,T], text_self_attention_masks [B,T,T]
        train: bool = False,
        deterministic: bool = True,
        prompt_replace_values: Optional[jnp.ndarray] = None,  # [B, T, E]
        prompt_replace_mask: Optional[jnp.ndarray] = None,  # [B, T] bool
    ) -> Dict[str, Any]:
        cfg = self.cfg
        cd = self.compute_dtype
        is_zira = cfg.modelname in ZIRA_MODELNAMES

        # on-device normalization for uint8 inputs (4x smaller host->device
        # transfers; the reference's model-side normalizer,
        # `groundingdino_dt.py::normalizer`); padded pixels re-zeroed to match
        # the normalize-then-pad order
        if pixels.dtype == jnp.uint8:
            mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
            std = jnp.asarray(cfg.pixel_std, jnp.float32)
            pixels = (pixels.astype(jnp.float32) - mean) / std
            pixels = jnp.where(mask[..., None], pixels, 0.0)

        # ------------------------------------------------ text path
        bert_out = BertEncoder(cfg.bert, dtype=cd, name="bert")(
            text["input_ids"],
            text["text_self_attention_masks"] if cfg.sub_sentence_present
            else text["text_token_mask"],
            position_ids=text["position_ids"] if cfg.sub_sentence_present else None,
            deterministic=deterministic,
        )  # [B, T, 768]

        encoded_text = Dense(
            cfg.hidden_dim, dtype=cd,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name="feat_map",
        )(bert_out)

        loss_linear_adapter = jnp.zeros((), jnp.float32)
        if cfg.use_cet:
            lang_adapter = _language_adapter(cfg, cd) if is_zira else None
            if lang_adapter is not None:
                # ZIL averaged over VALID tokens only (see zira._masked_mean)
                rep_out, loss_linear_adapter = lang_adapter(
                    bert_out, train=train, mask=text["text_token_mask"])
                encoded_text = encoded_text + rep_out
            else:
                # see TextEncoder: repconv/repconvbn + use_cet -> CET adapter
                # (`groundingdino_repconvbn.py:253-270,473-474`)
                cet_cls = {
                    "Adapter": Adapter, "Linear": LinearAdapter,
                    "Transformer": TransformerAdapter,
                }[cfg.cet_type]
                kw = dict(embed_dim=cfg.bert.hidden_size, output_dim=cfg.hidden_dim,
                          use_self_kd=False, dtype=cd, name="cet_adapter")
                if cfg.cet_type != "Linear":
                    kw["down_dim"] = cfg.cet_middle_dim
                if cfg.cet_type != "Transformer":
                    kw["gate_base_scale"] = 1.0
                cet_out, loss_linear_adapter = cet_cls(**kw)(bert_out, deterministic)
                encoded_text = encoded_text + cet_out

        # prompt-memory injection: replace learned classes' token features
        # with stored embeddings (`groundingdino_dt.py:521-531`, active at
        # inference when use_prompt_memory_output, or under prompt tuning)
        if prompt_replace_values is not None and prompt_replace_mask is not None:
            encoded_text = jnp.where(
                prompt_replace_mask[..., None],
                prompt_replace_values.astype(encoded_text.dtype),
                encoded_text,
            )

        text_dict = {
            "encoded_text": encoded_text,
            "text_token_mask": text["text_token_mask"],
            "position_ids": text["position_ids"],
            "text_self_attention_masks": text["text_self_attention_masks"],
        }

        # ------------------------------------------------ image path
        if cfg.backbone.startswith("resnet"):
            from ziragroundingdino_tpu.models.resnet import RESNET_DEPTHS, ResNet

            feats = ResNet(
                depths=RESNET_DEPTHS[cfg.backbone],
                out_indices=cfg.return_interm_indices, dtype=cd, name="backbone",
            )(pixels, mask, deterministic)
        else:
            feats = SwinTransformer(cfg.swin, dtype=cd, name="backbone")(
                pixels, mask, deterministic=deterministic
            )  # list of (feat NHWC, mask)

        srcs, masks_lvl, poss = [], [], []
        loss_conv_adapter = jnp.zeros((), jnp.float32)
        num_backbone_outs = len(feats)
        pos_learned = None
        if cfg.position_embedding in ("v3", "learned"):
            # `PositionEmbeddingLearned` (`position_encoding.py:137-171`);
            # one table shared by all levels like the reference module
            pos_learned = (
                self.param("pos_row_embed", nn.initializers.uniform(1.0),
                           (50, cfg.hidden_dim // 2)),
                self.param("pos_col_embed", nn.initializers.uniform(1.0),
                           (50, cfg.hidden_dim // 2)),
            )
        for lvl in range(cfg.num_feature_levels):
            if lvl < num_backbone_outs:
                feat, m = feats[lvl]
                src_in, ks, stride = feat, 1, 1
            else:
                # extra level: 3x3/s2 conv on the deepest backbone feature,
                # then on the previous extra level (`groundingdino.py:144-150`)
                src_in = feats[-1][0] if lvl == num_backbone_outs else srcs[-1]
                ks, stride = 3, 2
            proj = InputProj(
                cfg.hidden_dim, kernel_size=ks, stride=stride, dtype=cd,
                name=f"input_proj_{lvl}",
            )
            extra = None
            if cfg.use_project_adapter and is_zira:
                va_cls = _vision_adapter_cls(cfg)
                kw = dict(features=cfg.hidden_dim, kernel_size=ks, stride=stride,
                          zero_value=cfg.zira_zero_init, dtype=cd,
                          name=f"input_proj_conv_adapter_{lvl}")
                if va_cls is RepZeroConv:
                    kw["scale_init"] = cfg.zira_vis_scale
                extra, zl = va_cls(**kw)(src_in, train=train)
                loss_conv_adapter = loss_conv_adapter + zl
            # adapter placement differs by variant: dual-branch ZiRa and
            # repconv add BEFORE the input_proj GroupNorm
            # (`groundingdino_dual_zero_rep_branch.py:487-529`,
            # `groundingdino_repconv.py:583-584`), while repconvbn and the
            # multilayer variant add AFTER the full projection
            # (`groundingdino_repconvbn.py:613-614`,
            # `groundingdino_dual_zero_rep_multilayer_branch.py:575-576`)
            post_norm_adapter = cfg.modelname in (
                "repconvbngroundingdino",
                "dualzerorepmultilayerbranchgroundingdino",
            )
            if post_norm_adapter and extra is not None:
                src = proj(src_in) + extra
            else:
                src = proj(src_in, extra)
            if lvl < num_backbone_outs:
                m_lvl = m
            else:
                m_lvl = interpolate_mask_nearest(mask, src.shape[1], src.shape[2])
            srcs.append(src)
            masks_lvl.append(m_lvl)
            if pos_learned is not None:
                from ziragroundingdino_tpu.models.position_encoding import (
                    position_embedding_learned,
                )

                poss.append(
                    position_embedding_learned(m_lvl, *pos_learned).astype(cd)
                )
            else:
                poss.append(
                    position_embedding_sine_hw(
                        m_lvl, num_pos_feats=cfg.hidden_dim // 2,
                        temperature_h=cfg.pe_temperature_h,
                        temperature_w=cfg.pe_temperature_w,
                    ).astype(cd)
                )

        # CAT conditional prompt (`groundingdino_conditional_adapter_tuning.py:
        # 366-378`): MoE-adapt the pooled deepest-level feature, add to the
        # encoded text (pool includes padding, like adaptive_avg_pool2d there)
        prompt_loss = jnp.zeros((), jnp.float32)
        if cfg.use_prompt:
            ctx = jnp.mean(srcs[-1].astype(jnp.float32), axis=(1, 2))[:, None, :]
            prompt_out, prompt_loss = MoeAdapter(
                embed_dim=cfg.hidden_dim, down_dim=64, output_dim=cfg.hidden_dim,
                gate_base_scale=1.0, num_experts=cfg.num_experts,
                topk=cfg.num_topk_experts, use_self_kd=False,
                dtype=cd, name="prompt_adapter",
            )(ctx.astype(cd), deterministic)
            prompt_loss = prompt_loss + jnp.mean(jnp.abs(prompt_out.astype(jnp.float32)))
            text_dict = dict(
                text_dict,
                encoded_text=text_dict["encoded_text"] + prompt_out,
            )

        # ------------------------------------------------ heads (params shared
        # with the transformer's enc heads per two_stage_*_share flags)
        class_embed = ContrastiveEmbed(
            max_text_len=cfg.max_text_len, use_linear=cfg.use_cls_linear,
            hidden_dim=cfg.hidden_dim, dtype=cd, name="class_embed",
        )
        # shared box MLP (dec_pred_bbox_embed_share=True, zero-init last layer
        # `groundingdino.py:176-186`)
        bbox_mlp = MLP(
            hidden_dim=cfg.hidden_dim, output_dim=4, num_layers=3,
            zero_init_last=True, dtype=jnp.float32, name="bbox_embed",
        )
        enc_bbox_mlp = MLP(
            hidden_dim=cfg.hidden_dim, output_dim=4, num_layers=3,
            zero_init_last=True, dtype=jnp.float32, name="enc_out_bbox_embed",
        )

        # the enc (two-stage) class head is a separate copy when not shared
        # (`groundingdino.py:225-231`; two_stage_class_embed_share=False)
        enc_class_module = (
            class_embed
            if cfg.two_stage_class_embed_share or not cfg.use_cls_linear
            else ContrastiveEmbed(
                max_text_len=cfg.max_text_len, use_linear=cfg.use_cls_linear,
                hidden_dim=cfg.hidden_dim, dtype=cd, name="enc_out_class_embed",
            )
        )

        def bbox_embed(layer_id: int, x):
            del layer_id  # shared head
            return bbox_mlp(x.astype(jnp.float32))

        def enc_class_embed(memory, td):
            return enc_class_module(memory, td)

        def enc_bbox_embed_fn(x):
            return enc_bbox_mlp(x.astype(jnp.float32))

        tr_out = Transformer(cfg, dtype=cd, name="transformer")(
            srcs, masks_lvl, poss, text_dict,
            enc_class_embed, enc_bbox_embed_fn, bbox_embed, deterministic,
        )
        text_dict = dict(text_dict, encoded_text=tr_out["memory_text"])

        hs = tr_out["hidden_states"]  # list n_dec x [B, Q, E]
        refs = tr_out["references"]  # list (n_dec+1) x [B, Q, 4] sigmoided

        # anchor-update box outputs (`groundingdino.py:369-376`)
        outputs_coord = []
        for ref_sig, layer_hs in zip(refs[:-1], hs):
            delta = bbox_mlp(layer_hs.astype(jnp.float32))
            outputs_coord.append(jax.nn.sigmoid(delta + inverse_sigmoid(ref_sig)))
        outputs_class = [class_embed(layer_hs, text_dict) for layer_hs in hs]

        out: Dict[str, Any] = {
            "pred_logits": outputs_class[-1],  # [B, Q, max_text_len] fp32
            "pred_boxes": outputs_coord[-1],  # [B, Q, 4] cxcywh in [0,1]
            "encoded_text": text_dict["encoded_text"],
        }
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_boxes": b}
                for c, b in zip(outputs_class[:-1], outputs_coord[:-1])
            ]
            # encoder (two-stage) head outputs (`two_stage_criterion.py:19-100`);
            # computed with the ENC head (`groundingdino_dual_zero_rep_branch.py:
            # 571`: transformer.enc_out_class_embed) so its params (when
            # use_cls_linear makes it parametric) receive the `_enc` gradient
            out["interm_outputs"] = {
                "pred_logits": enc_class_module(tr_out["hs_enc"], text_dict),
                "pred_boxes": tr_out["ref_enc"],
            }
        out["adapter_losses"] = {
            "loss_linear_adapter": loss_linear_adapter,
            "loss_conv_adapter": loss_conv_adapter,
            "loss_adapter": tr_out["adapter_loss"] + prompt_loss,
        }
        return out
