"""PyTorch -> JAX checkpoint converter.

One-way weight bridge for reference checkpoints (e.g. the released
`groundingdino_swint_ogc.pth`), reproducing `clean_state_dict`'s `module.`
stripping (`util/misc.py:711-716`) and `load_state_dict(strict=False)`
semantics (`train_net.py:169`): unmatched keys are reported, not fatal.

The mapping is rule-based over the reference's module names (SURVEY §2.2
layer map). Tensor layout conversions:
  * Linear weight [out, in]        -> kernel [in, out]        (transpose)
  * Conv2d weight [out, in, kh, kw]-> kernel [kh, kw, in, out]
  * LayerNorm/GroupNorm weight/bias-> scale/bias
  * nn.MultiheadAttention in_proj_weight [3E, E] -> in_proj_kernel [E, 3E]
  * RepZero dual branches: weight->branch_kernel, freeze_*->freeze_kernel
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def clean_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """`util/misc.py:711-716`."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _t(w):  # linear weight -> kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # conv weight -> HWIO
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _id(w):
    return np.asarray(w)


# ---------------------------------------------------------------------------
# rule table: (regex on the torch key, flax path template, transform)
# groups are available as \1.. in the template; `{ln}` means weight->scale.
# ---------------------------------------------------------------------------

def _linear(dst):  # weight/bias pair under a Dense
    return [(r"\.weight$", dst + "/kernel", _t), (r"\.bias$", dst + "/bias", _id)]


_RULES: List[Tuple[str, str, object]] = []


def _rule(pat: str, dst: str, tf=_id):
    _RULES.append((re.compile(pat), dst, tf))


def _ln_rules(src: str, dst: str):
    _rule(src + r"\.weight$", dst + "/scale")
    _rule(src + r"\.bias$", dst + "/bias")


def _lin_rules(src: str, dst: str):
    _rule(src + r"\.weight$", dst + "/kernel", _t)
    _rule(src + r"\.bias$", dst + "/bias")


def _mha_rules(src: str, dst: str):
    _rule(src + r"\.in_proj_weight$", dst + "/in_proj_kernel", _t)
    _rule(src + r"\.in_proj_bias$", dst + "/in_proj_bias")
    _lin_rules(src + r"\.out_proj", dst + "/out_proj")


# ---- backbone (swin) ------------------------------------------------------
_rule(r"backbone\.0\.patch_embed\.proj\.weight$", "backbone/patch_embed_proj/kernel", _conv)
_rule(r"backbone\.0\.patch_embed\.proj\.bias$", "backbone/patch_embed_proj/bias")
_ln_rules(r"backbone\.0\.patch_embed\.norm", "backbone/patch_embed_norm")
_ln_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.norm1",
          r"backbone/layers_\1_blocks_\2/norm1")
_ln_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.norm2",
          r"backbone/layers_\1_blocks_\2/norm2")
_rule(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn\.relative_position_bias_table$",
      r"backbone/layers_\1_blocks_\2/attn/relative_position_bias_table")
_lin_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn\.qkv",
           r"backbone/layers_\1_blocks_\2/attn/qkv")
_lin_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.attn\.proj",
           r"backbone/layers_\1_blocks_\2/attn/proj")
_lin_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc1",
           r"backbone/layers_\1_blocks_\2/mlp_fc1")
_lin_rules(r"backbone\.0\.layers\.(\d+)\.blocks\.(\d+)\.mlp\.fc2",
           r"backbone/layers_\1_blocks_\2/mlp_fc2")
_ln_rules(r"backbone\.0\.layers\.(\d+)\.downsample\.norm", r"backbone/layers_\1_downsample/norm")
_rule(r"backbone\.0\.layers\.(\d+)\.downsample\.reduction\.weight$",
      r"backbone/layers_\1_downsample/reduction/kernel", _t)
_ln_rules(r"backbone\.0\.norm(\d+)", r"backbone/norm\1")
# relative_position_index buffers are recomputed statically — drop
_rule(r"backbone\.0\..*relative_position_index$", "<drop>")
_rule(r"backbone\.0\..*attn_mask$", "<drop>")

# ---- bert -----------------------------------------------------------------
_rule(r"bert\.embeddings\.word_embeddings\.weight$", "bert/word_embeddings")
_rule(r"bert\.embeddings\.position_embeddings\.weight$", "bert/position_embeddings")
_rule(r"bert\.embeddings\.token_type_embeddings\.weight$", "bert/token_type_embeddings")
_ln_rules(r"bert\.embeddings\.LayerNorm", "bert/embeddings_norm")
_rule(r"bert\.embeddings\.position_ids$", "<drop>")
for src, dst in (
    (r"attention\.self\.query", "attention_self/query"),
    (r"attention\.self\.key", "attention_self/key"),
    (r"attention\.self\.value", "attention_self/value"),
    (r"attention\.output\.dense", "attention_output_dense"),
    (r"intermediate\.dense", "intermediate_dense"),
    (r"output\.dense", "output_dense"),
):
    _lin_rules(r"bert\.encoder\.layer\.(\d+)\." + src, r"bert/layer_\1/" + dst)
_ln_rules(r"bert\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm",
          r"bert/layer_\1/attention_output_norm")
_ln_rules(r"bert\.encoder\.layer\.(\d+)\.output\.LayerNorm", r"bert/layer_\1/output_norm")
_rule(r"bert\.pooler\..*$", "<drop>")  # frozen + unused (`groundingdino.py:118-121`)

# ---- learned position embedding (`backbone/position_encoding.py:137-171`,
# registered as backbone.1 by the Joiner) — [50, F] tables, no transpose ----
_rule(r"backbone\.1\.row_embed\.weight$", "pos_row_embed")
_rule(r"backbone\.1\.col_embed\.weight$", "pos_col_embed")

# ---- text/input projections ------------------------------------------------
_lin_rules(r"feat_map", "feat_map")
_rule(r"input_proj\.(\d+)\.0\.weight$", r"input_proj_\1/conv/kernel", _conv)
_rule(r"input_proj\.(\d+)\.0\.bias$", r"input_proj_\1/conv/bias")
_ln_rules(r"input_proj\.(\d+)\.1", r"input_proj_\1/norm")

# ---- ZiRa rep branches ------------------------------------------------------
for ln in ("rep_linear_adapter", "rep_language_adapter"):
    _rule(rf"{ln}\.weight$", f"{ln}/branch_kernel", _t)
    _rule(rf"{ln}\.bias$", f"{ln}/branch_bias")
    _rule(rf"{ln}\.scaling$", f"{ln}/scaling")
    _rule(rf"{ln}\.freeze_linear\.weight$", f"{ln}/freeze_kernel", _t)
    _rule(rf"{ln}\.freeze_linear\.bias$", f"{ln}/freeze_bias")
    # RepZeroLoRA factors (`adapter.py:227-259`, bias-free)
    _rule(rf"{ln}\.down\.weight$", f"{ln}/down_kernel", _t)
    _rule(rf"{ln}\.up\.weight$", f"{ln}/up_kernel", _t)
# multilayer variant's freeze GN (`multilayer_branch.py:83`)
_rule(r"input_proj_conv_adapter\.(\d+)\.freeze_gn\.weight$",
      r"input_proj_conv_adapter_\1/freeze_gn_scale")
_rule(r"input_proj_conv_adapter\.(\d+)\.freeze_gn\.bias$",
      r"input_proj_conv_adapter_\1/freeze_gn_bias")
# repconvbn variant's conv+bn branch (`groundingdino_repconvbn.py:65-95`)
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.conv\.weight$",
      r"input_proj_conv_adapter_\1/branch_kernel", _conv)
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.conv\.bias$",
      r"input_proj_conv_adapter_\1/branch_bias")
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.bn\.weight$",
      r"input_proj_conv_adapter_\1/bn_scale")
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.bn\.bias$",
      r"input_proj_conv_adapter_\1/bn_bias")
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.bn\.running_mean$",
      r"<stats>input_proj_conv_adapter_\1/bn_mean")
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.bn\.running_var$",
      r"<stats>input_proj_conv_adapter_\1/bn_var")
_rule(r"input_proj_conv_adapter\.(\d+)\.branch\.bn\.num_batches_tracked$", "<drop>")
_rule(r"input_proj_conv_adapter\.(\d+)\.weight$",
      r"input_proj_conv_adapter_\1/branch_kernel", _conv)
_rule(r"input_proj_conv_adapter\.(\d+)\.bias$", r"input_proj_conv_adapter_\1/branch_bias")
_rule(r"input_proj_conv_adapter\.(\d+)\.scaling$", r"input_proj_conv_adapter_\1/scaling")
_rule(r"input_proj_conv_adapter\.(\d+)\.freeze_conv\.weight$",
      r"input_proj_conv_adapter_\1/freeze_kernel", _conv)
_rule(r"input_proj_conv_adapter\.(\d+)\.freeze_conv\.bias$",
      r"input_proj_conv_adapter_\1/freeze_bias")

# ---- cet adapter (dt model) -------------------------------------------------
_lin_rules(r"cet_adapter\.adapter_down", "cet_adapter/adapter_down")
_lin_rules(r"cet_adapter\.adapter_up", "cet_adapter/adapter_up")
_rule(r"cet_adapter\.gate\.weight$", "cet_adapter/gate/gate")
_lin_rules(r"cet_adapter\.linear", "cet_adapter/linear")

# ---- CAT conditional prompt MoE adapter -------------------------------------
# (`groundingdino_conditional_adapter_tuning.py:137-146` -> `moe.py:144-307`).
# The shipped config uses num_experts=1; the torch per-expert parameters map
# into our stacked [E, ...] expert arrays at index 0 (e>0 keys would surface
# as unmatched, loudly).
_rule(r"prompt_adapter\.adapter_moe\.w_gate$", "prompt_adapter/adapter_moe/w_gate")
_rule(r"prompt_adapter\.adapter_moe\.w_noise$", "prompt_adapter/adapter_moe/w_noise")
_rule(r"prompt_adapter\.adapter_moe\.experts\.0\.fc1\.weight$",
      "prompt_adapter/adapter_moe/fc1_kernel", lambda a: a.T[None])
_rule(r"prompt_adapter\.adapter_moe\.experts\.0\.fc1\.bias$",
      "prompt_adapter/adapter_moe/fc1_bias", lambda a: a[None])
_rule(r"prompt_adapter\.adapter_moe\.experts\.0\.fc2\.weight$",
      "prompt_adapter/adapter_moe/fc2_kernel", lambda a: a.T[None])
_rule(r"prompt_adapter\.adapter_moe\.experts\.0\.fc2\.bias$",
      "prompt_adapter/adapter_moe/fc2_bias", lambda a: a[None])
# registered buffers of the gate's Normal distribution: constants (0, 1)
_rule(r"prompt_adapter\.adapter_moe\.mean$", "<drop>")
_rule(r"prompt_adapter\.adapter_moe\.std$", "<drop>")

# ---- in-layer adapters (cat variant, `transformer_for_adapter.py:850,969`) --
for side in ("encoder", "decoder"):
    _lin_rules(rf"transformer\.{side}\.layers\.(\d+)\.adapter\.adapter_down",
               rf"transformer/{side}/layers_\1/adapter/adapter_down")
    _lin_rules(rf"transformer\.{side}\.layers\.(\d+)\.adapter\.adapter_up",
               rf"transformer/{side}/layers_\1/adapter/adapter_up")
    _rule(rf"transformer\.{side}\.layers\.(\d+)\.adapter\.gate\.weight$",
          rf"transformer/{side}/layers_\1/adapter/gate/gate")

# ---- transformer top-level --------------------------------------------------
_rule(r"transformer\.level_embed$", "transformer/level_embed")
_rule(r"transformer\.tgt_embed\.weight$", "transformer/tgt_embed")
_lin_rules(r"transformer\.enc_output", "transformer/enc_output")
_ln_rules(r"transformer\.enc_output_norm", "transformer/enc_output_norm")
for j in range(3):
    _lin_rules(
        rf"transformer\.enc_out_bbox_embed\.layers\.{j}",
        rf"enc_out_bbox_embed/layers_{j}",
    )
_lin_rules(r"transformer\.enc_out_class_embed\.cls_linear", "enc_out_class_embed/cls_linear")

# ---- encoder ----------------------------------------------------------------
for src, dst in (
    ("sampling_offsets", "sampling_offsets"),
    ("attention_weights", "attention_weights"),
    ("value_proj", "value_proj"),
    ("output_proj", "output_proj"),
):
    _lin_rules(
        rf"transformer\.encoder\.layers\.(\d+)\.self_attn\.{src}",
        rf"transformer/encoder/layers_\1/self_attn/{dst}",
    )
_ln_rules(r"transformer\.encoder\.layers\.(\d+)\.norm1", r"transformer/encoder/layers_\1/norm1")
_ln_rules(r"transformer\.encoder\.layers\.(\d+)\.norm2", r"transformer/encoder/layers_\1/norm2")
_lin_rules(r"transformer\.encoder\.layers\.(\d+)\.linear1", r"transformer/encoder/layers_\1/linear1")
_lin_rules(r"transformer\.encoder\.layers\.(\d+)\.linear2", r"transformer/encoder/layers_\1/linear2")

_mha_rules(r"transformer\.encoder\.text_layers\.(\d+)\.self_attn",
           r"transformer/encoder/text_layers_\1/self_attn")
_ln_rules(r"transformer\.encoder\.text_layers\.(\d+)\.norm1",
          r"transformer/encoder/text_layers_\1/norm1")
_ln_rules(r"transformer\.encoder\.text_layers\.(\d+)\.norm2",
          r"transformer/encoder/text_layers_\1/norm2")
_lin_rules(r"transformer\.encoder\.text_layers\.(\d+)\.linear1",
           r"transformer/encoder/text_layers_\1/linear1")
_lin_rules(r"transformer\.encoder\.text_layers\.(\d+)\.linear2",
           r"transformer/encoder/text_layers_\1/linear2")

_ln_rules(r"transformer\.encoder\.fusion_layers\.(\d+)\.layer_norm_v",
          r"transformer/encoder/fusion_layers_\1/layer_norm_v")
_ln_rules(r"transformer\.encoder\.fusion_layers\.(\d+)\.layer_norm_l",
          r"transformer/encoder/fusion_layers_\1/layer_norm_l")
for proj in ("v_proj", "l_proj", "values_v_proj", "values_l_proj", "out_v_proj", "out_l_proj"):
    _lin_rules(
        rf"transformer\.encoder\.fusion_layers\.(\d+)\.attn\.{proj}",
        rf"transformer/encoder/fusion_layers_\1/attn/{proj}",
    )
_rule(r"transformer\.encoder\.fusion_layers\.(\d+)\.gamma_v$",
      r"transformer/encoder/fusion_layers_\1/gamma_v")
_rule(r"transformer\.encoder\.fusion_layers\.(\d+)\.gamma_l$",
      r"transformer/encoder/fusion_layers_\1/gamma_l")

# ---- decoder ----------------------------------------------------------------
for src, dst in (
    ("sampling_offsets", "sampling_offsets"),
    ("attention_weights", "attention_weights"),
    ("value_proj", "value_proj"),
    ("output_proj", "output_proj"),
):
    _lin_rules(
        rf"transformer\.decoder\.layers\.(\d+)\.cross_attn\.{src}",
        rf"transformer/decoder/layers_\1/cross_attn/{dst}",
    )
_mha_rules(r"transformer\.decoder\.layers\.(\d+)\.self_attn",
           r"transformer/decoder/layers_\1/self_attn")
_mha_rules(r"transformer\.decoder\.layers\.(\d+)\.ca_text",
           r"transformer/decoder/layers_\1/ca_text")
_ln_rules(r"transformer\.decoder\.layers\.(\d+)\.catext_norm",
          r"transformer/decoder/layers_\1/catext_norm")
for nrm in ("norm1", "norm2", "norm3"):
    _ln_rules(rf"transformer\.decoder\.layers\.(\d+)\.{nrm}",
              rf"transformer/decoder/layers_\1/{nrm}")
for lin in ("linear1", "linear2"):
    _lin_rules(rf"transformer\.decoder\.layers\.(\d+)\.{lin}",
               rf"transformer/decoder/layers_\1/{lin}")
_ln_rules(r"transformer\.decoder\.norm", "transformer/decoder/norm")
# iter_update aliases the shared heads onto the decoder
# (`groundingdino.py:181-200`: decoder.bbox_embed = self.bbox_embed), so the
# state_dict carries the same tensors twice — canonical copy is bbox_embed.0
_rule(r"transformer\.decoder\.bbox_embed\..*$", "<drop>")
_rule(r"transformer\.decoder\.class_embed\..*$", "<drop>")
for j in range(2):
    _lin_rules(rf"transformer\.decoder\.ref_point_head\.layers\.{j}",
               rf"transformer/decoder/ref_point_head/layers_{j}")

# ---- heads ------------------------------------------------------------------
# bbox_embed is shared across decoder layers (`groundingdino.py:181-186`):
# bbox_embed.0 is the canonical copy; bbox_embed.{>0} are the same tensor.
for j in range(3):
    _lin_rules(rf"bbox_embed\.0\.layers\.{j}", rf"bbox_embed/layers_{j}")
_rule(r"bbox_embed\.[1-9]\d*\..*$", "<drop>")
_lin_rules(r"class_embed\.0\.cls_linear", "class_embed/cls_linear")
_rule(r"class_embed\.[1-9]\d*\..*$", "<drop>")
# prompt memory pool: handled separately (ragged per-class embeddings)
_rule(r"prompt_memory_pool\..*$", "<drop-prompt>")
_rule(r"label_enc\..*$", "<drop>")


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict[str, np.ndarray], List[str]]:
    """Returns (flax param tree, batch_stats tree, prompt_memory dict,
    unmatched keys)."""
    sd = clean_state_dict(torch_sd)
    tree: Dict = {}
    batch_stats: Dict = {}
    prompt_memory: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []

    for key, val in sd.items():
        val = np.asarray(val)
        hit = False
        for pat, dst, tf in _RULES:
            m = pat.match(key)
            if m is None or m.end() != len(key):
                continue
            hit = True
            if dst == "<drop>":
                break
            if dst == "<drop-prompt>":
                name = key[len("prompt_memory_pool."):]
                prompt_memory[name] = val
                break
            target = tree
            path = m.expand(dst) if "\\" in dst else dst
            if path.startswith("<stats>"):
                path = path[len("<stats>"):]
                target = batch_stats
            node = target
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = tf(val)
            break
        if not hit:
            unmatched.append(key)
    return tree, batch_stats, prompt_memory, unmatched


def load_torch_checkpoint(path: str):
    """Loads a reference .pth and converts. Handles the {'model': sd} wrapper
    detectron2 writes."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_state_dict(sd)


def merge_into(params: Dict, converted: Dict, path: str = "") -> List[str]:
    """strict=False merge: copies converted leaves into params in place
    (dict tree), returns list of converted paths missing from params or with
    shape mismatches (reported like the reference's strict=False load)."""
    problems: List[str] = []

    def rec(dst, src, prefix):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst or not isinstance(dst[k], dict):
                    problems.append(prefix + k + " (missing subtree)")
                    continue
                rec(dst[k], v, prefix + k + "/")
            else:
                if k not in dst:
                    problems.append(prefix + k + " (missing)")
                elif tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    problems.append(
                        f"{prefix + k} (shape {np.shape(dst[k])} vs {np.shape(v)})"
                    )
                else:
                    dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    rec(params, converted, path)
    return problems
