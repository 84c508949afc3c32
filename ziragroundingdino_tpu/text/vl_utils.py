"""Vision-language span utilities.

Parity with `util/vl_utils.py`:
  * `build_captions_and_token_span` (`:49-89`) — join category names into a
    caption and record each category's character span;
  * `create_positive_map_from_span` (`:8-46`) — char spans -> token-level
    positive map via the tokenizer's char_to_token mapping (here: computed
    from our WordPiece tokenizer's own offsets).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ziragroundingdino_tpu.text.tokenizer import WordPieceTokenizer


def build_captions_and_token_span(
    cat_list: Sequence[str], force_lowercase: bool = True
) -> Tuple[str, Dict[str, List[Tuple[int, int]]]]:
    """`util/vl_utils.py:49-89`: caption = 'a . b . c .'-style join (the
    reference joins with ' . ' and appends ' .'); returns char spans."""
    cat2span: Dict[str, List[Tuple[int, int]]] = {}
    caption = ""
    for name in cat_list:
        if force_lowercase:
            name = name.lower()
        if caption:
            caption += " . "
        start = len(caption)
        caption += name
        cat2span[name] = [(start, len(caption))]
    caption += " ."
    return caption, cat2span


def encode_with_offsets(
    tokenizer: WordPieceTokenizer, text: str
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Tokenize returning per-token (char_start, char_end) offsets — the
    HF `char_to_token` facility our native tokenizer needs for span maps."""
    ids: List[int] = [tokenizer.cls_id]
    offsets: List[Tuple[int, int]] = [(0, 0)]
    # walk basic tokens while tracking their source positions
    pos = 0
    lowered = text.lower() if tokenizer.lowercase else text
    for word in tokenizer._basic(text):
        # find the word in the lowered text from `pos` (basic tokenization
        # preserves order; accents were stripped so fall back to fuzzy skip)
        found = lowered.find(word, pos)
        if found < 0:
            found = pos
        start = found
        pieces = tokenizer._wordpiece(word)
        n = len(word)
        # distribute chars across pieces proportionally to piece length
        cursor = start
        for j, pid in enumerate(pieces):
            if len(pieces) == 1:
                span = (start, start + n)
            else:
                plen = max(1, n // len(pieces))
                span = (cursor, min(cursor + plen, start + n))
                cursor = span[1]
            ids.append(pid)
            offsets.append(span)
        pos = start + n
    ids.append(tokenizer.sep_id)
    offsets.append((len(text), len(text)))
    return ids, offsets


def create_positive_map_from_span(
    tokenizer: WordPieceTokenizer,
    caption: str,
    token_spans: Sequence[Sequence[Tuple[int, int]]],
    max_text_len: int = 256,
) -> np.ndarray:
    """[num_phrases, max_text_len] normalized positive map
    (`util/vl_utils.py:8-46`)."""
    ids, offsets = encode_with_offsets(tokenizer, caption)
    t = min(len(ids), max_text_len)
    positive = np.zeros((len(token_spans), max_text_len), np.float32)
    for j, spans in enumerate(token_spans):
        for (beg, end) in spans:
            for ti in range(t):
                s, e = offsets[ti]
                if s == e:
                    continue
                if s < end and e > beg:
                    positive[j, ti] = 1.0
    norm = positive.sum(-1, keepdims=True)
    return positive / np.clip(norm, 1e-6, None)
