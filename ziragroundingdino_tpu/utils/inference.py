"""User-facing inference API.

Parity with `util/inference.py:24-97` (`load_model`/`load_image`/`predict`/
`annotate`) and the demo's phrase extraction
(`demo/inference_on_a_image.py:78-119` + `util/utils.py:598`
get_phrases_from_posmap).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.config import DataConfig, GroundingDINOConfig, get_model_config
from ziragroundingdino_tpu.data.transforms import (
    Sample,
    eval_transform,
    normalize,
    pad_to_bucket,
    pick_bucket,
)
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.text.tokenizer import WordPieceTokenizer, load_vocab, tokenize_captions


@dataclass
class LoadedModel:
    model: GroundingDINO
    params: Dict
    tokenizer: WordPieceTokenizer
    cfg: GroundingDINOConfig
    prompt_memory: Dict[str, np.ndarray]


def load_model(
    checkpoint_path: str,
    vocab_path: str,
    preset: str = "groundingdino",
    **overrides,
) -> LoadedModel:
    """SLConfig+build_model+ckpt load (`util/inference.py:24-33`), via the
    converter. `vocab_path` is the bert-base-uncased vocab.txt."""
    from ziragroundingdino_tpu.utils.torch_convert import load_torch_checkpoint, merge_into

    cfg = get_model_config(preset, **overrides)
    model = GroundingDINO(cfg=cfg)
    tokenizer = WordPieceTokenizer(load_vocab(vocab_path))

    # init with a minimal dummy batch to build the param skeleton (image must
    # carry >= num_queries multi-scale tokens: 128px covers 900 queries)
    pixels = jnp.zeros((1, 128, 128, 3), jnp.float32)
    mask = jnp.ones((1, 128, 128), bool)
    tb = tokenize_captions(tokenizer, ["object."], max_text_len=cfg.max_text_len,
                           max_categories=cfg.max_categories)
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    variables = model.init(jax.random.PRNGKey(0), pixels, mask, text)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    tree, batch_stats, prompt_memory, unmatched = load_torch_checkpoint(checkpoint_path)
    problems = merge_into(params, tree)
    if problems or unmatched:
        import logging

        logging.getLogger("ziragroundingdino_tpu").info(
            "checkpoint load (strict=False): %d problems, %d unmatched keys",
            len(problems), len(unmatched),
        )
    return LoadedModel(model=model, params={"params": params}, tokenizer=tokenizer,
                       cfg=cfg, prompt_memory=prompt_memory)


def load_image(path: str, cfg: Optional[DataConfig] = None):
    """`util/inference.py:35-41`: resize shortest 800 / max 1333 + normalize.
    Returns (image_source uint8 HWC, device arrays (pixels, mask), true size)."""
    from PIL import Image

    cfg = cfg or DataConfig()
    src = np.asarray(Image.open(path).convert("RGB"))
    sample = Sample(image=src, boxes=np.zeros((0, 4), np.float32),
                    labels=np.zeros((0,), np.int64), orig_size=src.shape[:2])
    s = eval_transform(sample, cfg)
    bucket = pick_bucket(s.image.shape[0], s.image.shape[1], cfg.shape_buckets)
    pixels, mask = pad_to_bucket(normalize(s.image, cfg), bucket)
    return src, (jnp.asarray(pixels[None]), jnp.asarray(mask[None])), s.image.shape[:2]


def get_phrases_from_posmap(
    posmap: np.ndarray,  # [T] bool
    input_ids: Sequence[int],
    tokenizer: WordPieceTokenizer,
    left_idx: int = 0,
    right_idx: int = 255,
) -> str:
    """`util/utils.py:598-620`: decode the tokens whose logit exceeds the
    text threshold into a phrase."""
    posmap = np.asarray(posmap).copy()
    posmap[: left_idx + 1] = False
    posmap[right_idx:] = False
    ids = [int(input_ids[i]) for i in np.flatnonzero(posmap)]
    inv = getattr(tokenizer, "_inv_vocab", None)
    if inv is None:
        inv = {v: k for k, v in tokenizer.vocab.items()}
        tokenizer._inv_vocab = inv
    words: List[str] = []
    for t in ids:
        piece = inv.get(t, "[UNK]")
        if piece.startswith("##") and words:
            words[-1] += piece[2:]
        else:
            words.append(piece)
    return " ".join(words)


def predict(
    lm: LoadedModel,
    pixels: jnp.ndarray,
    mask: jnp.ndarray,
    caption: str,
    box_threshold: float = 0.35,
    text_threshold: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """`util/inference.py:48-97`: returns (boxes cxcywh normalized [N,4],
    confidence [N], phrases [N])."""
    caption = caption.lower().strip()
    if not caption.endswith("."):
        caption += "."
    tb = tokenize_captions(
        lm.tokenizer, [caption], max_text_len=lm.cfg.max_text_len,
        max_categories=lm.cfg.max_categories,
    )
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    out = jax.jit(
        lambda p, px, m, t: lm.model.apply(p, px, m, t, train=False)
    )(lm.params, pixels, mask, text)

    t = tb.input_ids.shape[1]
    logits = jax.nn.sigmoid(np.asarray(out["pred_logits"][0, :, :t], np.float32))
    boxes = np.asarray(out["pred_boxes"][0], np.float32)

    keep = logits.max(axis=1) > box_threshold
    logits, boxes = logits[keep], boxes[keep]
    phrases = [
        get_phrases_from_posmap(l > text_threshold, tb.input_ids[0], lm.tokenizer,
                                right_idx=t - 1)
        for l in logits
    ]
    return boxes, logits.max(axis=1), phrases


def predict_classes(
    lm: LoadedModel,
    pixels: jnp.ndarray,
    mask: jnp.ndarray,
    class_names: Sequence[str],
    box_threshold: float = 0.35,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Per-class mode (`demo/inference_on_a_image_multi_classes.py` /
    `demo/groundingdino_detector.py:120-135`): caption = joined class names,
    class of each box = argmax over per-category recovered logits."""
    from ziragroundingdino_tpu.text.masks import recover_to_cls_logits
    from ziragroundingdino_tpu.text.tokenizer import build_captions

    caption = build_captions([c.lower().strip() for c in class_names])
    tb = tokenize_captions(
        lm.tokenizer, [caption], max_text_len=lm.cfg.max_text_len,
        max_categories=max(len(class_names), 1),
    )
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    out = jax.jit(
        lambda p, px, m, t: lm.model.apply(p, px, m, t, train=False)
    )(lm.params, pixels, mask, text)
    t = tb.input_ids.shape[1]
    cls_logits = recover_to_cls_logits(
        out["pred_logits"][:, :, :t], jnp.asarray(tb.cate_to_token_mask)
    )
    probs = np.asarray(jax.nn.sigmoid(cls_logits[0]), np.float32)  # [Q, C]
    boxes = np.asarray(out["pred_boxes"][0], np.float32)
    best = probs.max(axis=1)
    keep = best > box_threshold
    labels = probs.argmax(axis=1)[keep]
    return boxes[keep], best[keep], [class_names[i] for i in labels]


def annotate(
    image_source: np.ndarray,
    boxes: np.ndarray,  # [N, 4] cxcywh normalized
    logits: np.ndarray,
    phrases: List[str],
) -> np.ndarray:
    """Draw boxes+labels (PIL-based; the reference uses supervision,
    `util/inference.py:82-97`)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image_source.copy())
    draw = ImageDraw.Draw(img)
    h, w = image_source.shape[:2]
    for box, score, phrase in zip(boxes, logits, phrases):
        cx, cy, bw, bh = box * [w, h, w, h]
        xy = [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]
        draw.rectangle(xy, outline=(255, 0, 0), width=2)
        draw.text((xy[0], max(xy[1] - 12, 0)), f"{phrase} {score:.2f}", fill=(255, 0, 0))
    return np.asarray(img)
