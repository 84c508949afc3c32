"""Text mask generation parity vs a direct transcription of the reference loop
(`bertwarper.py:224-273`) run in numpy, plus device-side class-logit recovery
(`utils.py:312-320`)."""

import numpy as np
import jax.numpy as jnp

from ziragroundingdino_tpu.text.masks import (
    SPECIAL_TOKEN_IDS,
    generate_special_token_masks,
    recover_to_cls_logits,
)


def _reference_loop(input_ids, special_ids):
    """Literal transcription of the reference algorithm for the oracle."""
    bs, num_token = input_ids.shape
    special = np.isin(input_ids, special_ids)
    attention_mask = np.tile(np.eye(num_token, dtype=bool)[None], (bs, 1, 1))
    position_ids = np.zeros((bs, num_token), dtype=np.int64)
    c2t_list = [[] for _ in range(bs)]
    idxs = np.argwhere(special)
    prev = 0
    for row, col in idxs:
        if col == 0 or col == num_token - 1:
            attention_mask[row, col, col] = True
            position_ids[row, col] = 0
        else:
            attention_mask[row, prev + 1 : col + 1, prev + 1 : col + 1] = True
            position_ids[row, prev + 1 : col + 1] = np.arange(0, col - prev)
            m = np.zeros((num_token,), dtype=bool)
            m[prev + 1 : col] = True
            c2t_list[row].append(m)
        prev = col
    return attention_mask, position_ids, c2t_list


def _fake_tokenized(captions):
    """Tiny deterministic 'tokenizer': one id per word, '.'->1012, CLS/SEP."""
    vocab = {}
    rows = []
    for cap in captions:
        ids = [101]
        for word in cap.split("."):
            word = word.strip()
            if not word:
                continue
            for tok in word.split():
                ids.append(vocab.setdefault(tok, 2000 + len(vocab)))
            ids.append(1012)
        ids.append(102)
        rows.append(ids)
    t = max(len(r) for r in rows)
    out = np.zeros((len(rows), t), dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def test_masks_match_reference_loop():
    ids = _fake_tokenized(["cat. dog. big zebra.", "person."])
    ref_attn, ref_pos, ref_c2t = _reference_loop(ids, np.asarray(SPECIAL_TOKEN_IDS))
    got = generate_special_token_masks(ids, max_categories=8)
    np.testing.assert_array_equal(got["text_self_attention_masks"], ref_attn)
    np.testing.assert_array_equal(got["position_ids"], ref_pos)
    assert got["num_categories"].tolist() == [3, 1]
    for b in range(2):
        # reference appends empty categories at padded rows' [SEP]; we drop them
        ref_nonempty = [m for m in ref_c2t[b] if m.any()]
        for c, m in enumerate(ref_nonempty):
            np.testing.assert_array_equal(got["cate_to_token_mask"][b, c], m)
        assert not got["cate_to_token_mask"][b, len(ref_nonempty) :].any()


def test_masks_padding_to_bucket():
    ids = _fake_tokenized(["cat. dog."])
    got = generate_special_token_masks(ids, pad_to_text_len=32, max_categories=4)
    t = ids.shape[1]
    assert got["text_self_attention_masks"].shape == (1, 32, 32)
    # padded region: only diagonal self-attention
    assert not got["text_self_attention_masks"][0, t:, :t].any()
    assert got["position_ids"].shape == (1, 32)
    assert got["cate_to_token_mask"].shape == (1, 4, 32)


def test_recover_to_cls_logits():
    rng = np.random.default_rng(0)
    B, Q, T, C = 2, 5, 12, 3
    logits = rng.standard_normal((B, Q, T)).astype(np.float32)
    mask = np.zeros((B, C, T), dtype=bool)
    mask[0, 0, 1:3] = True
    mask[0, 1, 4:9] = True
    mask[1, 0, 2:5] = True
    out = np.asarray(recover_to_cls_logits(jnp.asarray(logits), jnp.asarray(mask)))
    # reference double loop
    expected = np.full((B, Q, C), -100.0, np.float32)
    for b in range(B):
        for c in range(C):
            if mask[b, c].any():
                expected[b, :, c] = logits[b][:, mask[b, c]].max(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-6)
