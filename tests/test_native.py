"""Native C++ runtime: parity with the Python oracles (tokenizer, image ops)."""

import numpy as np
import pytest

from tests.common import tiny_tokenizer
from ziragroundingdino_tpu.native import (
    NativeTokenizer,
    get_lib,
    normalize_pad,
    resize_bilinear_u8,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


def test_native_tokenizer_matches_python(tmp_path):
    tok_py = tiny_tokenizer()
    # write the synthetic vocab as a vocab.txt
    inv = sorted(tok_py.vocab.items(), key=lambda kv: kv[1])
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(k for k, _ in inv) + "\n")
    tok_c = NativeTokenizer(str(vf))
    for text in ("cat.dog.", "a zebra?  fish!", "CAT.Dog.", "unknownword.",
                 "cats and dogs, 123."):
        assert tok_c.encode(text) == tok_py.encode(text), text


def test_native_normalize_pad_matches_python():
    from ziragroundingdino_tpu.config import DataConfig
    from ziragroundingdino_tpu.data.transforms import normalize, pad_to_bucket

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(37, 53, 3), dtype=np.uint8)
    cfg = DataConfig()
    ref_img, ref_mask = pad_to_bucket(normalize(img, cfg), (48, 64))
    out = normalize_pad(img, cfg.pixel_mean, cfg.pixel_std, 48, 64)
    assert out is not None
    got_img, got_mask = out
    np.testing.assert_allclose(got_img, ref_img, atol=1e-4)
    np.testing.assert_array_equal(got_mask, ref_mask)


def test_native_resize_close_to_pil():
    from PIL import Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(64, 96, 3), dtype=np.uint8)
    got = resize_bilinear_u8(img, 32, 48)
    assert got is not None
    ref = np.asarray(Image.fromarray(img).resize((48, 32), Image.BILINEAR))
    # PIL uses a triangular filter with support scaling on downsample; our
    # kernel is pure bilinear — allow small differences, require high overlap
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert np.mean(diff) < 1.0 and np.max(diff) <= 2, (np.mean(diff), np.max(diff))
