"""Caption structure: block-diagonal text masks and category->token maps.

Re-implements `generate_masks_with_special_tokens_and_transfer_map`
(`models/GroundingDINO/bertwarper.py:224-273`): a caption
``"cat. dog. zebra."`` is split at special tokens ([CLS]/[SEP]/./?) into
per-category sub-sentences; tokens of one category may only self-attend
(block-diagonal [T, T] mask), position ids restart at 0 inside each block, and
a category->token boolean map feeds the per-class max-pool of token logits
(`utils.py:312-320`).

The reference builds these with python loops over nonzero() indices — fine on
host, impossible under jit. Here:
  * `generate_special_token_masks` runs host-side in vectorized numpy at
    tokenization time (strings are host data anyway) and emits fixed-size
    arrays padded to (max_text_len, max_categories) — the ragged
    `cate_to_token_mask_list` becomes a static [B, C, T] bool tensor;
  * `recover_to_cls_logits` is the on-device, fully vectorized per-category
    segment-max.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

# bert-base-uncased ids for [CLS], [SEP], '.', '?'
# (`groundingdino.py:130`: tokenizer.convert_tokens_to_ids for those tokens)
SPECIAL_TOKEN_IDS: Tuple[int, ...] = (101, 102, 1012, 1029)


def generate_special_token_masks(
    input_ids: np.ndarray,
    pad_to_text_len: int | None = None,
    max_categories: int = 90,
    special_ids: Sequence[int] = SPECIAL_TOKEN_IDS,
):
    """Host-side mask generation (numpy), parity with `bertwarper.py:224-273`.

    Args:
      input_ids: [B, T] int array from the tokenizer (0-padded).
      pad_to_text_len: output T' >= T to pad to (static bucket); default T.
      max_categories: C — categories beyond this are dropped (reference is
        unbounded/ragged; ODinW captions max out well below 90).

    Returns dict of numpy arrays:
      text_self_attention_masks: [B, T', T'] bool — True = may attend.
      position_ids:              [B, T'] int32 — restart at 0 per block.
      cate_to_token_mask:        [B, C, T'] bool — token membership per category.
      num_categories:            [B] int32.
    """
    input_ids = np.asarray(input_ids)
    bs, num_token = input_ids.shape
    tp = int(pad_to_text_len or num_token)
    assert tp >= num_token

    special = np.isin(input_ids, np.asarray(special_ids))

    attention_mask = np.zeros((bs, tp, tp), dtype=bool)
    attention_mask[:, np.arange(tp), np.arange(tp)] = True  # eye, as reference
    position_ids = np.zeros((bs, tp), dtype=np.int32)
    c2t = np.zeros((bs, max_categories, tp), dtype=bool)
    num_cate = np.zeros((bs,), dtype=np.int32)

    for row in range(bs):
        cols = np.flatnonzero(special[row])
        previous_col = 0
        ci = 0
        for col in cols:
            col = int(col)
            if col == 0 or col == num_token - 1:
                # [CLS] at 0 / trailing token: self-attention only, pos 0
                position_ids[row, col] = 0
            else:
                attention_mask[row, previous_col + 1 : col + 1, previous_col + 1 : col + 1] = True
                position_ids[row, previous_col + 1 : col + 1] = np.arange(0, col - previous_col)
                # NOTE: the reference appends a category for every non-terminal
                # special token, including the empty span a padded row's [SEP]
                # produces (`bertwarper.py:255-261`); an empty category would
                # break its own per-class max (`utils.py:312-320`), so we only
                # keep non-empty spans — identical in every valid case.
                if ci < max_categories and col > previous_col + 1:
                    c2t[row, ci, previous_col + 1 : col] = True
                    ci += 1
            previous_col = col
        num_cate[row] = ci

    return {
        "text_self_attention_masks": attention_mask,
        "position_ids": position_ids,
        "cate_to_token_mask": c2t,
        "num_categories": num_cate,
    }


def recover_to_cls_logits(
    token_logits: jnp.ndarray,
    cate_to_token_mask: jnp.ndarray,
    fill: float = -100.0,
) -> jnp.ndarray:
    """Per-category max over member-token logits, vectorized.

    Parity with `utils.py:312-320` (python double-loop in the reference):
    ``new_logits[b, q, c] = max_t token_logits[b, q, t] where mask[b, c, t]``;
    categories with no tokens (padding rows) get `fill`.

    Args:
      token_logits:       [B, Q, T] (already -inf on padded text tokens).
      cate_to_token_mask: [B, C, T] bool.
    Returns:
      [B, Q, C'] where C' = max(C, T)?  No — the reference writes into a
      [B, Q, T]-shaped buffer; we keep [B, Q, C] and the criterion pads class
      ids accordingly, with the final buffer padded back to max_text_len by
      the caller when exact logit-shape parity is needed.
    """
    masked = jnp.where(
        cate_to_token_mask[:, None, :, :],  # [B, 1, C, T]
        token_logits[:, :, None, :],  # [B, Q, 1, T]
        -jnp.inf,
    )
    out = jnp.max(masked, axis=-1)  # [B, Q, C]
    has_tokens = jnp.any(cate_to_token_mask, axis=-1)  # [B, C]
    return jnp.where(has_tokens[:, None, :], out, fill)
