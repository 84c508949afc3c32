"""Typed configuration tree.

Replaces the reference's dual config system — SLConfig exec'd python model
configs (`groundingdino/util/slconfig.py:76-135`) plus detectron2 LazyConfig
train/data/optim configs (`groundingdino/config/config.py:36-53`) — with one
set of frozen dataclasses. The knob surface mirrors
`groundingdino/config/GroundingDINO_SwinT_OGC_rep.py:1-96` and friends; each
field keeps the reference's default so checkpoints and ablations line up.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclass(frozen=True)
class SwinConfig:
    """Swin Transformer backbone hyper-parameters.

    Mirrors `backbone/swin_transformer.py:762-791` (variant dict at :771-787).
    """

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 4
    in_chans: int = 3
    drop_path_rate: float = 0.2
    # indices of stages whose output feeds the detector neck
    # (`GroundingDINO_SwinT_OGC_rep.py:10` return_interm_indices = [1, 2, 3])
    out_indices: Tuple[int, ...] = (1, 2, 3)
    use_checkpoint: bool = False

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(int(self.embed_dim * 2**i) for i in range(len(self.depths)))


SWIN_VARIANTS: Dict[str, SwinConfig] = {
    # `backbone/swin_transformer.py:771-787`
    "swin_T_224_1k": SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_B_224_22k": SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_B_384_22k": SwinConfig(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size=12
    ),
    "swin_L_224_22k": SwinConfig(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
    "swin_L_384_22k": SwinConfig(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window_size=12
    ),
}


@dataclass(frozen=True)
class BertConfig:
    """BERT-base-uncased text encoder (HF `bert-base-uncased` architecture).

    The reference wraps HF `BertModel` (`util/get_tokenlizer.py:21-26`) through
    `BertModelWarper` to accept 3-D block-diagonal attention masks + custom
    position ids (`bertwarper.py:17-166`). We implement the encoder natively.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0


@dataclass(frozen=True)
class GroundingDINOConfig:
    """Full model config. Field-for-field parity with
    `groundingdino/config/GroundingDINO_SwinT_OGC_rep.py` (values cited inline).
    """

    modelname: str = "dualzerorepbranchgroundingdino"
    backbone: str = "swin_T_224_1k"
    position_embedding: str = "sine"
    pe_temperature_h: float = 20.0  # pe_temperatureH (:8)
    pe_temperature_w: float = 20.0  # pe_temperatureW (:9)
    return_interm_indices: Tuple[int, ...] = (1, 2, 3)
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.0
    nheads: int = 8
    num_queries: int = 900
    query_dim: int = 4
    num_patterns: int = 0
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    two_stage_type: str = "standard"
    transformer_activation: str = "relu"
    dec_pred_bbox_embed_share: bool = True
    two_stage_bbox_embed_share: bool = False
    two_stage_class_embed_share: bool = False
    embed_init_tgt: bool = True
    max_text_len: int = 256
    text_encoder_type: str = "bert-base-uncased"
    use_text_enhancer: bool = True
    use_fusion_layer: bool = True
    use_checkpoint: bool = False  # remat the encoder fusion layers
    use_transformer_ckpt: bool = False  # remat the deformable layers
    use_text_cross_attention: bool = True
    text_dropout: float = 0.0
    fusion_dropout: float = 0.0
    fusion_droppath: float = 0.1
    sub_sentence_present: bool = True

    # train
    aux_loss: bool = True
    freeze_all: bool = True

    # test
    select_box_nums_for_evaluation: int = 200

    # adapter (CAT variant, `GroundingDINO_SwinT_OGC_cat.py`)
    use_adapter: bool = False
    use_self_kd: bool = False
    encoder_gate_base_scale: float = 0.1
    decoder_gate_base_scale: float = 0.1

    # task-agnostic caption augmentation (`groundingdino_dt.py:452-460`)
    use_add_names: bool = False
    use_learned_names: bool = False
    num_select_prompt: int = 20

    # CET language adapter (`groundingdino_dt.py:182-206`)
    use_cet: bool = True
    cet_middle_dim: int = 1024
    cet_type: str = "Adapter"
    # CAT conditional prompt: MoE adapter over the pooled deepest level,
    # added to the encoded text (`groundingdino_conditional_adapter_tuning.py:
    # 137-146,366-378`; `GroundingDINO_SwinT_OGC_cat.py:61`)
    use_prompt: bool = False
    use_prompt_memory: bool = False
    use_prompt_memory_output: bool = True

    # ZiRa (`GroundingDINO_SwinT_OGC_rep.py:62-96`)
    use_zero_inter_loss: bool = True
    use_project_adapter: bool = True
    use_zero_inter_loss_for_conv: bool = True
    loss_adapter_weight: float = 0.1
    zira_zero_init: float = 1e-8  # `groundingdino_dual_zero_rep_branch.py:62`
    zira_lan_scale: float = 0.1  # :63
    zira_vis_scale: float = 0.1  # :64
    # language-side branch shape: "linear" (RepZeroLinear, `:243-249`) or
    # "lora" (RepZeroLoRA low-rank alternative, `:251-253`, `adapter.py:227`)
    zira_lan_adapter: str = "linear"
    zira_lora_down_dim: Optional[int] = None  # None = in_features // 4

    # MoE (`moe.py:144`; configs default to 1 expert)
    num_experts: int = 1
    num_topk_experts: int = 1

    # other PET baselines
    use_bert_tuning: bool = False
    use_cls_linear: bool = False
    use_prompt_tuning: bool = False
    # PET baseline: train the RAW input projections (`groundingdino_dt.py:
    # 781-782` unfreezes "input_proj"), distinct from use_project_adapter's
    # ZeroConv side branches
    use_project_tuning: bool = False

    # pixel normalization — the reference model owns this
    # (`groundingdino_dt.py::normalizer`, mean/std from the dt config);
    # applied on device when the model receives uint8 pixels
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)

    # --- TPU-specific (no reference counterpart) ---
    # compute dtype for matmul-heavy paths; params always fp32
    compute_dtype: str = "bfloat16"
    # pallas kernel for MSDeformAttn ("pallas" | "xla")
    msda_impl: str = "xla"
    # max number of categories per caption after padding (ragged->static)
    max_categories: int = 90

    sub: Dict[str, Any] = field(default_factory=dict)

    # overrides for tests / small-scale runs; None = canonical presets
    swin_config: Optional[SwinConfig] = None
    bert_config: Optional[BertConfig] = None

    @property
    def swin(self) -> SwinConfig:
        base = self.swin_config or SWIN_VARIANTS[self.backbone]
        return dataclasses.replace(base, out_indices=self.return_interm_indices)

    @property
    def bert(self) -> BertConfig:
        return self.bert_config or BertConfig()

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.nheads

    def replace(self, **kw) -> "GroundingDINOConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Model-config presets: one per reference SLConfig file
# (`groundingdino/config/GroundingDINO_SwinT_OGC*.py`); selected by name the
# way `--model-config-file` + `modelname` registry dispatch does
# (`models/__init__.py:11-18`).
# ---------------------------------------------------------------------------

def _preset(**kw) -> GroundingDINOConfig:
    return GroundingDINOConfig(**kw)


MODEL_PRESETS: Dict[str, GroundingDINOConfig] = {
    # vanilla inference model (`GroundingDINO_SwinT_OGC.py`)
    "groundingdino": _preset(
        modelname="groundingdino", use_cet=False, use_project_adapter=False,
        use_zero_inter_loss=False, use_zero_inter_loss_for_conv=False,
    ),
    # detectron2-trainable scaffold + PET baselines (`GroundingDINO_SwinT_OGC_dt.py`)
    "dtgroundingdino": _preset(
        modelname="dtgroundingdino", use_add_names=True, use_learned_names=True,
        use_zero_inter_loss=False, use_project_adapter=False,
        use_zero_inter_loss_for_conv=False, loss_adapter_weight=0.005,
    ),
    # ZiRa headline model (`GroundingDINO_SwinT_OGC_rep.py`)
    "dualzerorepbranchgroundingdino": _preset(),
    # multilayer-branch variant (`groundingdino_dual_zero_rep_multilayer_branch.py:971`)
    "dualzerorepmultilayerbranchgroundingdino": _preset(
        modelname="dualzerorepmultilayerbranchgroundingdino",
    ),
    # single-path rep variants (`groundingdino_repconv.py:1041`, `groundingdino_repconvbn.py:1069`)
    "repgroundingdino": _preset(
        modelname="repgroundingdino", use_cet=False, use_zero_inter_loss=False,
    ),
    "repconvbngroundingdino": _preset(
        modelname="repconvbngroundingdino", use_cet=False, use_zero_inter_loss=False,
    ),
    # full fine-tune (`GroundingDINO_SwinT_OGC_dt_finetuning.py`: freeze_all=False)
    "finetune": _preset(modelname="dtgroundingdino", freeze_all=False, use_cet=False,
                        use_zero_inter_loss=False, use_project_adapter=False,
                        use_zero_inter_loss_for_conv=False),
    # linear probing (`..._linearprobing.py`: use_cls_linear)
    "linearprobe": _preset(modelname="dtgroundingdino", use_cls_linear=True, use_cet=False,
                           use_zero_inter_loss=False, use_project_adapter=False,
                           use_zero_inter_loss_for_conv=False),
    # prompt tuning (`..._prompttuning.py`)
    "prompttune": _preset(modelname="dtgroundingdino", use_prompt_tuning=True, use_cet=False,
                          use_zero_inter_loss=False, use_project_adapter=False,
                          use_zero_inter_loss_for_conv=False),
    # BERT tuning (`..._berttuning.py`)
    "berttune": _preset(modelname="dtgroundingdino", use_bert_tuning=True, use_cet=False,
                        use_zero_inter_loss=False, use_project_adapter=False,
                        use_zero_inter_loss_for_conv=False),
    # projection tuning (`..._projecttuning.py`)
    "projecttune": _preset(modelname="dtgroundingdino", use_project_tuning=True,
                           use_project_adapter=False, use_cet=False,
                           use_zero_inter_loss=False, use_zero_inter_loss_for_conv=False),
    # conditional adapter tuning / CAT (`GroundingDINO_SwinT_OGC_cat.py`)
    "catgroundingdino": _preset(modelname="catgroundingdino", use_adapter=True, use_cet=False,
                                use_prompt=True,
                                use_zero_inter_loss=False, use_project_adapter=False,
                                use_zero_inter_loss_for_conv=False),
}


def get_model_config(name: str, **overrides) -> GroundingDINOConfig:
    """Look up a preset by name and apply overrides (the SLConfig
    `merge_from_dict` equivalent, `util/slconfig.py:137-179`)."""
    cfg = MODEL_PRESETS[name]
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


# ---------------------------------------------------------------------------
# Train / optim / schedule configs (LazyConfig surface:
# `config/configs/common/{train,optim,coco_schedule}.py`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW defaults from `config/configs/common/optim.py:16-28` and the task
    configs (`test_odinw13_softfreeze/for_train/test_aquarium.py:20-26`)."""

    name: str = "adamw"
    lr: float = 1e-3
    weight_decay: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    grad_clip: float = 0.1
    # per-parameter LR multipliers keyed by substring match on the param path,
    # replacing detectron2 `lr_factor_func` (softfreeze: 0.2 if "freeze" in name)
    lr_factors: Tuple[Tuple[str, float], ...] = ()


@dataclass(frozen=True)
class ScheduleConfig:
    """Multi-step schedule, `config/configs/common/coco_schedule.py:91-125`
    (modified_coco_scheduler): drop x0.1 at 8/9 and 17/18 of total."""

    name: str = "multistep"
    max_iter: int = 2000
    warmup_iter: int = 0
    warmup_factor: float = 0.001
    milestones_frac: Tuple[float, ...] = (8.0 / 9.0, 17.0 / 18.0)
    gamma: float = 0.1


@dataclass(frozen=True)
class TrainConfig:
    output_dir: str = "./output"
    max_iter: int = 2000
    seed: int = 42
    batch_size: int = 1  # per replica (`GroundingDINO_SwinT_OGC_rep.py:1`)
    batch_size_scale: int = 1  # grad accumulation (`train_net.py:128-140`)
    amp_enabled: bool = True  # bf16 on TPU; no GradScaler needed
    checkpoint_period: int = 2000
    eval_period: int = 2000
    log_period: int = 20
    ema_enabled: bool = False
    ema_decay: float = 0.999
    fast_dev_run: bool = False  # shrink run to 20 iters (`train_net.py:313-317`)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline config; static shape buckets are the TPU-ism replacing
    `nested_tensor_from_tensor_list` pad-to-max (`util/misc.py:474-500`)."""

    # multi-scale train augmentation (`config/configs/common/data/odinw/aquarium.py:49-60`)
    train_short_sides: Tuple[int, ...] = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)
    max_size: int = 1333
    test_short_side: int = 800
    random_flip: bool = True
    # canonical padded (H, W) buckets; every image is resized by the reference
    # recipe then padded to the smallest bucket that fits, so jit sees a tiny
    # closed set of shapes.
    shape_buckets: Tuple[Tuple[int, int], ...] = (
        (512, 768), (512, 1024), (768, 1024), (800, 1216), (800, 1344), (1024, 1344),
    )
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    max_boxes: int = 100  # GT padding bound
    num_workers: int = 2


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. Reference is DP-only (SURVEY §2.5); we add an optional
    model axis for tensor parallelism headroom."""

    data: int = -1  # -1: all devices
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


def load_config_overrides(path: str):
    """Hydrate a `{"model": {...}, "data": {...}}` overrides json (the CLI
    --config-overrides surface): json lists become tuples, nested
    swin_config/bert_config dicts become their dataclasses. Returns
    (model_overrides: dict, data_overrides: dict)."""
    import json as _json

    def tuplify(v):
        return tuple(tuplify(x) for x in v) if isinstance(v, list) else v

    with open(path) as f:
        ov = _json.load(f)
    model_ov = {k: tuplify(v) for k, v in ov.get("model", {}).items()}
    if isinstance(ov.get("model", {}).get("swin_config"), dict):
        model_ov["swin_config"] = SwinConfig(
            **{k: tuplify(v) for k, v in ov["model"]["swin_config"].items()})
    if isinstance(ov.get("model", {}).get("bert_config"), dict):
        model_ov["bert_config"] = BertConfig(
            **{k: tuplify(v) for k, v in ov["model"]["bert_config"].items()})
    data_ov = {k: tuplify(v) for k, v in ov.get("data", {}).items()}
    return model_ov, data_ov
