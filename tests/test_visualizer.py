"""COCOVisualizer / ColorMap / RLE-decode tests (reference
`util/visualizer.py:22-318`). Rendering is checked end-to-end through the
matplotlib Agg backend (file produced, sane dimensions); RLE decoding is
checked against the COCO column-major spec and a self-consistent
compressed-string round trip using the pycocotools varint scheme."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from ziragroundingdino_tpu.utils.visualizer import (
    COCOVisualizer, ColorMap, renorm, rle_decode)


def test_renorm_roundtrip_channels_last():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (8, 6, 3)).astype(np.float32)
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)
    normed = (raw - mean) / std
    out = renorm(normed)
    np.testing.assert_allclose(out, raw / 255.0, rtol=1e-5, atol=1e-5)
    # batched variant keeps the batch axis
    assert renorm(normed[None]).shape == (1, 8, 6, 3)


def test_colormap_alpha_heat():
    cm = ColorMap((255, 0, 0))
    attn = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = cm(attn)
    assert out.shape == (3, 4, 4) and out.dtype == np.uint8
    assert (out[..., 0] == 255).all() and (out[..., 1] == 0).all()
    np.testing.assert_array_equal(out[..., 3], attn)


def test_rle_decode_uncompressed_column_major():
    # counts [1, 2, 3]: column-major flat = [0, 1, 1, 0, 0, 0] on a 3x2 grid
    m = rle_decode({"counts": [1, 2, 3], "size": [3, 2]}, 3, 2)
    expect = np.zeros((3, 2), np.uint8)
    expect[1, 0] = 1  # flat idx 1 -> (row 1, col 0)
    expect[2, 0] = 1  # flat idx 2 -> (row 2, col 0)
    np.testing.assert_array_equal(m, expect)


def _rle_encode_compressed(counts):
    """pycocotools `rleToString` (maskApi.c): 6-bit varints, delta-coded
    from the 4th count on, offset by ASCII 48."""
    s = bytearray()
    for i, c in enumerate(counts):
        x = int(c) - (int(counts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = (x != -1) if (chunk & 0x10) else (x != 0)
            if more:
                chunk |= 0x20
            s.append(chunk + 48)
    return bytes(s)


def test_rle_decode_compressed_roundtrip():
    rng = np.random.default_rng(3)
    h, w = 17, 11
    mask = (rng.random((h, w)) < 0.4).astype(np.uint8)
    flat = mask.T.reshape(-1)  # column-major
    # run-length encode (first run counts zeros)
    counts, val, run = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            val, run = px, 1
    counts.append(run)
    out = rle_decode({"counts": _rle_encode_compressed(counts)}, h, w)
    np.testing.assert_array_equal(out, mask)
    # str (not bytes) counts take the same path
    out2 = rle_decode(
        {"counts": _rle_encode_compressed(counts).decode()}, h, w)
    np.testing.assert_array_equal(out2, mask)


def test_visualize_writes_file(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(32, 48, 3)).astype(np.float32)
    vis = COCOVisualizer(seed=0)
    tgt = {
        "image_id": 7,
        "size": (32, 48),
        "boxes": np.asarray([[0.5, 0.5, 0.4, 0.6], [0.3, 0.2, 0.2, 0.2]]),
        "box_label": ["cat 0.91", "dog 0.55"],
        "caption": "cat. dog.",
        "attn": (rng.random((32, 48)), (255, 255, 0)),
    }
    path = vis.visualize(img, tgt, savedir=str(tmp_path / "vis"))
    assert path.startswith(str(tmp_path / "vis")) and "7" in path
    import os
    assert os.path.getsize(path) > 1000
    # strings_positive branch + no-box branch
    p2 = vis.visualize(
        img,
        {"image_id": 8, "size": (32, 48),
         "boxes": np.asarray([[0.5, 0.5, 0.5, 0.5]]),
         "labels": np.asarray([2]), "strings_positive": [["striped", "cat"]]},
        caption="q", savedir=str(tmp_path / "vis"))
    assert os.path.getsize(p2) > 1000
    p3 = vis.visualize(img, {"caption": "no boxes"}, savedir=str(tmp_path / "v2"))
    assert os.path.getsize(p3) > 1000


def test_show_anns_instances_and_captions(tmp_path, capsys):
    import matplotlib.pyplot as plt

    class FakeCoco:
        imgs = {1: {"height": 16, "width": 16}}
        cats = {3: {"skeleton": [[1, 2]]}}

    vis = COCOVisualizer(coco=FakeCoco(), seed=0)
    plt.figure()
    plt.gca().imshow(np.zeros((16, 16, 3)))
    anns = [
        {"image_id": 1, "category_id": 3, "iscrowd": 0, "bbox": [1, 1, 6, 8],
         "segmentation": [[1, 1, 7, 1, 7, 9, 1, 9]],
         "keypoints": [2, 2, 2, 5, 6, 1]},
        {"image_id": 1, "category_id": 3, "iscrowd": 1, "bbox": [0, 0, 4, 4],
         "segmentation": {"counts": [4, 3, 249], "size": [16, 16]}},
    ]
    vis.showAnns(anns, draw_bbox=True)
    plt.close("all")

    vis.showAnns([{"caption": "a photo"}])
    assert "a photo" in capsys.readouterr().out
