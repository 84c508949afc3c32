"""Import shims letting the PYTORCH REFERENCE at /root/reference build on CPU.

The reference imports timm / torchvision / cv2 / matplotlib / pycocotools /
detectron2 / its CUDA extension `groundingdino._C` at module scope
(`swin_transformer.py:19`, `util/misc.py:24`, `util/visualizer.py:12-19`,
`groundingdino_dual_zero_rep_branch.py:56-57`, `ms_deform_attn.py:28`), none
of which are installed here. For the full-model parity oracle only the three
timm symbols carry real behavior; everything else is import-time-only on the
CPU forward path (MSDA falls back to `multi_scale_deformable_attn_pytorch`,
`ms_deform_attn.py:326-346`), so those are inert placeholder modules.

These stubs exist to TEST AGAINST the reference, not to copy it.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
from torch import nn

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() on the stub works
    # (transformers probes cv2 availability that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__path__ = []  # mark as package so `import stub.sub` resolves
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    """Idempotently register fake third-party modules, then put the
    reference repo on sys.path."""
    if "timm" in sys.modules and hasattr(sys.modules.get("timm", None), "_oracle_stub"):
        return

    # --- timm.models.layers: the 3 symbols swin_transformer.py:19 needs ---
    timm = _module("timm")
    timm._oracle_stub = True
    timm_models = _module("timm.models")
    timm_layers = _module("timm.models.layers")
    timm.models = timm_models
    timm_models.layers = timm_layers

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    class DropPath(nn.Module):  # inert at drop_prob=0 / eval
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rnd.floor_()

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_

    # --- torchvision: version gate + nms symbol (`util/misc.py:24-30`) ---
    tv = _module("torchvision")
    tv.__version__ = "0.15.1"
    tv._is_tracing = lambda: False
    tv_ops = _module("torchvision.ops")
    tv.ops = tv_ops
    tv_boxes = _module("torchvision.ops.boxes")
    tv_ops.boxes = tv_boxes

    def _no_nms(*a, **k):
        raise NotImplementedError("nms stub — not on the oracle path")

    tv_boxes.nms = _no_nms

    def box_area(boxes):  # the standard xyxy area (util/box_ops.py:6)
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_misc = _module("torchvision.ops.misc")
    tv_ops.misc = tv_misc
    tv_models = _module("torchvision.models")
    tv.models = tv_models
    tv_models_utils = _module("torchvision.models._utils")
    tv_models_utils.IntermediateLayerGetter = object  # resnet path only
    tv_models._utils = tv_models_utils

    # --- cv2 / matplotlib / pycocotools (visualizer import-time only) ---
    _module("cv2")
    # matplotlib is actually installed in this image: use the REAL package
    # (stubbing it into sys.modules broke every later-imported test module
    # that draws — tests/test_visualizer.py — since sys.modules is process
    # global). Only stub if genuinely absent.
    try:
        import matplotlib  # noqa: F401
        import matplotlib.collections  # noqa: F401
        import matplotlib.patches  # noqa: F401
        import matplotlib.pyplot  # noqa: F401
        import matplotlib.transforms  # noqa: F401
    except ImportError:  # pragma: no cover - not the shipped image
        mpl = _module("matplotlib")
        mpl.pyplot = _module("matplotlib.pyplot")
        mpl.transforms = _module("matplotlib.transforms")
        coll = _module("matplotlib.collections")
        coll.PatchCollection = object
        mpl.collections = coll
        patches = _module("matplotlib.patches")
        patches.Polygon = object
        mpl.patches = patches
    pct = _module("pycocotools")
    pct_mask = _module("pycocotools.mask")
    pct.mask = pct_mask

    # --- addict / yapf (slconfig.py:12-13 import-time deps) ---
    addict = _module("addict")

    class ADict(dict):
        """Just enough of addict.Dict for the reference's ConfigDict."""

        def __init__(self, *a, **k):
            super().__init__()
            for kk, vv in dict(*a, **k).items():
                self[kk] = self._hook(vv)

        @classmethod
        def _hook(cls, v):
            if isinstance(v, dict):
                return cls(v)
            if isinstance(v, (list, tuple)):
                return type(v)(cls._hook(x) for x in v)
            return v

        def __setattr__(self, k, v):
            self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                return self.__missing__(k)

        def __missing__(self, name):
            return self.__class__()

    addict.Dict = ADict
    yapf = _module("yapf")
    yapflib = _module("yapf.yapflib")
    yapf_api = _module("yapf.yapflib.yapf_api")
    yapf_api.FormatCode = lambda text, **kw: (text, True)
    yapf.yapflib = yapflib
    yapflib.yapf_api = yapf_api

    # --- detectron2: just enough structure for the ZiRa variants' eval
    # forward (`groundingdino_dual_zero_rep_branch.py:401-600`) — ImageList
    # is iterated by nested_tensor_from_tensor_list, Instances/Boxes are
    # attribute containers built by dt_inference ---
    d2 = _module("detectron2")
    d2_model = _module("detectron2.modeling")
    d2_model.detector_postprocess = lambda r, h, w: r
    d2.modeling = d2_model
    d2_struct = _module("detectron2.structures")

    class _ImageList:
        def __init__(self, tensors):
            self._tensors = list(tensors)
            self.image_sizes = [tuple(t.shape[-2:]) for t in self._tensors]

        @staticmethod
        def from_tensors(tensors, size_divisibility=0):
            return _ImageList(tensors)

        def __len__(self):
            return len(self._tensors)

        def __getitem__(self, i):
            return self._tensors[i]

    class _Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    class _Instances:
        def __init__(self, image_size):
            self.image_size = image_size

    d2_struct.Boxes = _Boxes
    d2_struct.ImageList = _ImageList
    d2_struct.Instances = _Instances
    d2.structures = d2_struct

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # --- the CUDA extension: CPU path never calls it (ms_deform_attn.py:326) ---
    import groundingdino as gd_pkg  # the reference package, NOT ours

    _c = _module("groundingdino._C")
    gd_pkg._C = _c


class StubHFTokenizer:
    """Duck-types the HF tokenizer surface the reference model touches
    (`groundingdino.py:118,130,262`): __call__ -> dict-like with
    input_ids/attention_mask/token_type_ids, and convert_tokens_to_ids for
    the special-token list. Backed by OUR WordPieceTokenizer so both sides
    see byte-identical token ids."""

    def __init__(self, wp_tokenizer, max_text_len: int = 32, max_categories: int = 8):
        self.wp = wp_tokenizer
        self.max_text_len = max_text_len
        self.max_categories = max_categories

    def convert_tokens_to_ids(self, tokens):
        return [self.wp.vocab[t] for t in tokens]

    def __call__(self, captions, padding="longest", return_tensors="pt"):
        from transformers.tokenization_utils_base import BatchEncoding

        # honest padding="longest": pad to the longest sequence, like HF —
        # NOT to a bucket (a trailing [PAD] run after [SEP] would register
        # as an empty category span in the reference's
        # generate_masks_with_special_tokens, `bertwarper.py:249-261`)
        enc = [self.wp.encode(c)[: self.max_text_len] for c in captions]
        t = max(len(e) for e in enc)
        ids = np.full((len(enc), t), self.wp.pad_id, np.int64)
        attn = np.zeros((len(enc), t), np.int64)
        for i, e in enumerate(enc):
            ids[i, : len(e)] = e
            attn[i, : len(e)] = 1
        ids = torch.from_numpy(ids)
        return BatchEncoding({
            "input_ids": ids,
            "attention_mask": torch.from_numpy(attn),
            "token_type_ids": torch.zeros_like(ids),
        })


def tiny_reference_args(max_text_len: int = 32):
    """The vanilla SLConfig (`config/GroundingDINO_SwinT_OGC.py`) shrunk to
    the tests' tiny scale (must mirror tests/common.py tiny_config)."""
    from groundingdino.util.slconfig import SLConfig

    args = SLConfig.fromfile(
        f"{REFERENCE_ROOT}/groundingdino/config/GroundingDINO_SwinT_OGC.py"
    )
    args.modelname = "groundingdino"
    args.hidden_dim = 64
    args.nheads = 4
    args.dim_feedforward = 128
    args.enc_layers = 2
    args.dec_layers = 2
    args.num_queries = 12
    args.max_text_len = max_text_len
    args.fusion_droppath = 0.0
    # fields build_groundingdino reads but this config omits
    args.use_prompt = False
    args.use_prompt_memory = False
    args.prompt_middle_dim = 1024
    return args


def tiny_reference_zira_args(max_text_len: int = 32):
    """`config/GroundingDINO_SwinT_OGC_rep.py` shrunk to tiny scale."""
    from groundingdino.util.slconfig import SLConfig

    args = SLConfig.fromfile(
        f"{REFERENCE_ROOT}/groundingdino/config/GroundingDINO_SwinT_OGC_rep.py"
    )
    args.hidden_dim = 64
    args.nheads = 4
    args.dim_feedforward = 128
    args.enc_layers = 2
    args.dec_layers = 2
    args.num_queries = 12
    args.max_text_len = max_text_len
    args.fusion_droppath = 0.0
    args.cet_middle_dim = 16
    return args


def tiny_reference_cat_args(max_text_len: int = 32):
    """`config/GroundingDINO_SwinT_OGC_cat.py` shrunk to tiny scale with the
    in-layer adapters ON (the config ships use_adapter=False; the adapter
    path is the capability under test)."""
    from groundingdino.util.slconfig import SLConfig

    args = SLConfig.fromfile(
        f"{REFERENCE_ROOT}/groundingdino/config/GroundingDINO_SwinT_OGC_cat.py"
    )
    args.hidden_dim = 64
    args.nheads = 4
    args.dim_feedforward = 128
    args.enc_layers = 2
    args.dec_layers = 2
    args.num_queries = 12
    args.max_text_len = max_text_len
    args.fusion_droppath = 0.0
    args.use_adapter = True
    return args


def build_tiny_reference_model(wp_tokenizer, max_text_len: int = 32, seed: int = 0,
                               kind: str = "vanilla"):
    """Constructs the reference GroundingDINO (vanilla or the ZiRa
    dual-zero-rep-branch variant) at tiny scale on CPU: tiny Swin dims
    injected through `build_swin_transformer`'s kw override
    (`swin_transformer.py:762-788`), tiny HF BertModel + our tokenizer via
    `get_tokenlizer` patching (`util/get_tokenlizer.py:4-27`)."""
    install_reference_stubs()
    torch.manual_seed(seed)

    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from groundingdino.util import get_tokenlizer as gt
    from groundingdino.models.GroundingDINO.backbone import backbone as bb_mod

    orig_build_swin = bb_mod.build_swin_transformer

    def tiny_swin(modelname, pretrain_img_size, **kw):
        kw.update(embed_dim=8, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
                  window_size=4, drop_path_rate=0.0)
        return orig_build_swin(modelname, pretrain_img_size, **kw)

    def tiny_bert(text_encoder_type):
        cfg = HFBertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        return HFBertModel(cfg)

    # the reference hardcodes num_pos_feats=256 (== its hidden_dim) for the
    # text-layer positions (`transformer_for_adapter.py:555-558`); at tiny
    # hidden_dim that must scale with the model exactly as our port does
    # (models/transformer.py:299-301)
    from groundingdino.models.GroundingDINO import transformer_for_adapter as tfa

    tfa._oracle_tiny_mode = True  # full-size builder flips this off
    if not getattr(tfa, "_oracle_pos_patched", False):
        _orig_gspe = tfa.get_sine_pos_embed

        def _scaled_gspe(pos_tensor, num_pos_feats=128, temperature=10000,
                         exchange_xy=True):
            if num_pos_feats == 256 and getattr(tfa, "_oracle_tiny_mode", True):
                # the hardcoded text-layer call sites, shrunk to the tiny
                # hidden_dim (tests/common.py); full-size keeps 256
                num_pos_feats = 64
            return _orig_gspe(pos_tensor, num_pos_feats, temperature, exchange_xy)

        tfa.get_sine_pos_embed = _scaled_gspe

        # likewise `gen_sineembed_for_position` hardcodes 128 = d_model/2
        # (`utils.py:203-230`); shrink to tiny hidden_dim//2 = 32
        _orig_sineembed = tfa.gen_sineembed_for_position

        def _tiny_sineembed(pos_tensor, _nf=32):
            if not getattr(tfa, "_oracle_tiny_mode", True):
                return _orig_sineembed(pos_tensor)
            import math as _m

            scale = 2 * _m.pi
            dim_t = torch.arange(_nf, dtype=torch.float32, device=pos_tensor.device)
            dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / _nf)

            def emb(c):
                p = c[:, :, None] * scale / dim_t
                return torch.stack(
                    (p[:, :, 0::2].sin(), p[:, :, 1::2].cos()), dim=3
                ).flatten(2)

            parts = [emb(pos_tensor[:, :, 1]), emb(pos_tensor[:, :, 0])]
            if pos_tensor.size(-1) == 4:
                parts += [emb(pos_tensor[:, :, 2]), emb(pos_tensor[:, :, 3])]
            return torch.cat(parts, dim=2)

        tfa.gen_sineembed_for_position = _tiny_sineembed
        tfa._oracle_pos_patched = True

    stub_tok = StubHFTokenizer(wp_tokenizer, max_text_len=max_text_len)
    orig = (gt.get_tokenlizer, gt.get_pretrained_language_model)
    bb_mod.build_swin_transformer = tiny_swin
    gt.get_tokenlizer = lambda t: stub_tok
    gt.get_pretrained_language_model = tiny_bert
    try:
        if kind == "vanilla":
            from groundingdino.models.GroundingDINO.groundingdino import (
                build_groundingdino,
            )

            model = build_groundingdino(tiny_reference_args(max_text_len))
        elif kind == "zira":
            from groundingdino.models.GroundingDINO.groundingdino_dual_zero_rep_branch import (
                build_dual_zero_rep_branch_groundingdino,
            )

            model = build_dual_zero_rep_branch_groundingdino(
                tiny_reference_zira_args(max_text_len))
            model.device = "cpu"  # ctor defaults to "cuda" (`:166`)
        elif kind == "multilayer":
            from groundingdino.models.GroundingDINO.groundingdino_dual_zero_rep_multilayer_branch import (
                build_dual_zero_rep_multi_layer_branch_groundingdino,
            )

            model = build_dual_zero_rep_multi_layer_branch_groundingdino(
                tiny_reference_zira_args(max_text_len))
            if hasattr(model, "device"):
                model.device = "cpu"
        elif kind == "repconvbn":
            from groundingdino.models.GroundingDINO.groundingdino_repconvbn import (
                build_repconvbn_groundingdino,
            )

            model = build_repconvbn_groundingdino(
                tiny_reference_zira_args(max_text_len))
            if hasattr(model, "device"):
                model.device = "cpu"
        elif kind == "cat":
            from groundingdino.models.GroundingDINO.groundingdino_conditional_adapter_tuning import (
                build_cat_groundingdino,
            )

            model = build_cat_groundingdino(tiny_reference_cat_args(max_text_len))
            if hasattr(model, "device"):
                model.device = "cpu"
        else:
            raise ValueError(kind)
    finally:
        bb_mod.build_swin_transformer = orig_build_swin
        gt.get_tokenlizer, gt.get_pretrained_language_model = orig
    model.eval()
    return model


# ---------------------------------------------------------------------------
# Session-scoped build caches (VERDICT r4 item 8): the oracle tier built the
# reference model anew per test; builds are deterministic in
# (vocab, max_text_len, seed, kind), so one pristine build per key serves the
# whole pytest process. Tiny models are handed out as deepcopies because the
# oracles mutate them (randomized freeze weights, monkey-patched
# dt_inference/matcher, before_train/__rep__ in-place); the fullsize model is
# handed out SHARED because all its users are read-only (state_dict reads and
# a no_grad forward).
# ---------------------------------------------------------------------------
_TINY_CACHE: dict = {}
_FULLSIZE_CACHE: dict = {}


def _vocab_key(wp_tokenizer):
    return tuple(sorted(wp_tokenizer.vocab.items()))


def get_tiny_reference_model(wp_tokenizer, max_text_len: int = 32,
                             seed: int = 0, kind: str = "vanilla"):
    """Cached `build_tiny_reference_model`; returns a fresh deepcopy so
    callers may mutate weights/methods freely."""
    import copy

    key = (_vocab_key(wp_tokenizer), max_text_len, seed, kind)
    if key not in _TINY_CACHE:
        _TINY_CACHE[key] = build_tiny_reference_model(
            wp_tokenizer, max_text_len=max_text_len, seed=seed, kind=kind)
    return copy.deepcopy(_TINY_CACHE[key])


def get_fullsize_reference_model(wp_tokenizer, max_text_len: int = 256,
                                 seed: int = 0):
    """Cached `build_fullsize_reference_model`; returns the SHARED pristine
    instance — callers must not mutate it (all current users are
    read-only)."""
    key = (_vocab_key(wp_tokenizer), max_text_len, seed)
    if key not in _FULLSIZE_CACHE:
        _FULLSIZE_CACHE[key] = build_fullsize_reference_model(
            wp_tokenizer, max_text_len=max_text_len, seed=seed)
    return _FULLSIZE_CACHE[key]


def build_fullsize_reference_model(wp_tokenizer, max_text_len: int = 256,
                                   seed: int = 0):
    """The reference's vanilla `build_groundingdino` at FULL dimensions
    (Swin-T, 6+6 layers, d=256, ffn 2048, 900 queries, BERT-base geometry)
    with random init and our synthetic tokenizer — the full-scale
    counterpart of `build_tiny_reference_model` closing the tiny-scale-only
    caveat (dimension-dependent code paths: the 256-dim positional
    hardcodes, 900-query selection, real head counts)."""
    install_reference_stubs()
    torch.manual_seed(seed)

    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from groundingdino.util import get_tokenlizer as gt
    from groundingdino.models.GroundingDINO import transformer_for_adapter as tfa

    tfa._oracle_tiny_mode = False  # keep the 256-dim hardcodes intact

    def base_bert(text_encoder_type):
        cfg = HFBertConfig(
            vocab_size=30522, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=512, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        return HFBertModel(cfg)

    stub_tok = StubHFTokenizer(wp_tokenizer, max_text_len=max_text_len)
    orig = (gt.get_tokenlizer, gt.get_pretrained_language_model)
    gt.get_tokenlizer = lambda t: stub_tok
    gt.get_pretrained_language_model = base_bert
    try:
        from groundingdino.models.GroundingDINO.groundingdino import (
            build_groundingdino,
        )
        from groundingdino.util.slconfig import SLConfig

        args = SLConfig.fromfile(
            f"{REFERENCE_ROOT}/groundingdino/config/GroundingDINO_SwinT_OGC.py"
        )
        args.use_prompt = False
        args.use_prompt_memory = False
        args.prompt_middle_dim = 1024
        model = build_groundingdino(args)
    finally:
        gt.get_tokenlizer, gt.get_pretrained_language_model = orig
        tfa._oracle_tiny_mode = True
    model.eval()
    return model
