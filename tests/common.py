"""Shared test helpers: tiny configs + synthetic batches."""

from __future__ import annotations

import numpy as np

from ziragroundingdino_tpu.config import BertConfig, GroundingDINOConfig, SwinConfig
from ziragroundingdino_tpu.text.tokenizer import (
    WordPieceTokenizer,
    make_synthetic_vocab,
    tokenize_captions,
)

TINY_SWIN = SwinConfig(
    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=4,
    drop_path_rate=0.0, out_indices=(1, 2, 3),
)
TINY_BERT = BertConfig(
    vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0,
)


def tiny_config(**overrides) -> GroundingDINOConfig:
    base = dict(
        hidden_dim=64,
        nheads=4,
        dim_feedforward=128,
        enc_layers=2,
        dec_layers=2,
        num_queries=12,
        num_feature_levels=4,
        max_text_len=32,
        max_categories=8,
        compute_dtype="float32",
        swin_config=TINY_SWIN,
        bert_config=TINY_BERT,
        fusion_droppath=0.0,
    )
    base.update(overrides)
    return GroundingDINOConfig(**base)


def tiny_tokenizer() -> WordPieceTokenizer:
    vocab = make_synthetic_vocab(["cat", "dog", "zebra", "person", "fish", "car"])
    return WordPieceTokenizer(vocab)


def tiny_text_batch(captions=("cat.dog.", "zebra.person.fish."), max_text_len=32):
    tok = tiny_tokenizer()
    tb = tokenize_captions(
        tok, list(captions), max_text_len=max_text_len, max_categories=8,
        text_len_buckets=(16, 32),
    )
    assert tb.input_ids.max() < 128
    return tb


def tiny_image_batch(b=2, h=64, w=96, valid_frac=0.8, seed=0):
    rng = np.random.RandomState(seed)
    pixels = rng.randn(b, h, w, 3).astype(np.float32)
    mask = np.zeros((b, h, w), dtype=bool)
    for i in range(b):
        mask[i, : int(h * valid_frac), : int(w * valid_frac)] = True
    return pixels, mask
