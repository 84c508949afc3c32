"""Serving latency benchmark: the bucketed Predictor on real hardware.

Measures end-to-end request latency (host preprocessing + tokenization +
device forward + postprocess fetch) per (image size, batch) bucket — the
production-serving numbers the reference has no analogue for.

Usage: python scripts/bench_serve.py [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from ziragroundingdino_tpu.models import build_model
    from ziragroundingdino_tpu.text.tokenizer import (
        WordPieceTokenizer, make_synthetic_vocab,
    )
    from ziragroundingdino_tpu.utils.predictor import Predictor
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])

    model = build_model("dualzerorepbranchgroundingdino")
    classes = ["person", "car", "dog", "cat", "chair", "bottle", "bird", "boat"]
    tok = WordPieceTokenizer(make_synthetic_vocab(classes))

    rng = np.random.RandomState(0)
    img_small = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
    img_large = rng.randint(0, 255, (1080, 1920, 3), dtype=np.uint8)

    # init params at a small shape (weights are shape-independent)
    import jax.numpy as jnp
    from ziragroundingdino_tpu.text.tokenizer import tokenize_captions

    tb = tokenize_captions(tok, ["person.car."], max_text_len=64,
                           max_categories=8, text_len_buckets=(64,))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    px = jnp.asarray(rng.randn(1, 512, 768, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, px, jnp.ones((1, 512, 768), bool), text))(
        jax.random.PRNGKey(0))

    pred = Predictor(model, params, tok)
    for name, img, n in (("640px b=1", img_small, 1), ("640px b=4", img_small, 4),
                         ("1080p b=1", img_large, 1), ("1080p b=4", img_large, 4)):
        imgs = [img] * n
        cls = [classes[:4]] * n
        pred(imgs, cls)  # compile + warmup
        best = 1e9
        for i in range(args.iters):
            # jitter each request so no layer can cache identical calls
            imgs_i = [np.clip(im.astype(np.int16) + (i % 3), 0, 255).astype(np.uint8)
                      for im in imgs]
            t0 = time.perf_counter()
            out = pred(imgs_i, cls)
            best = min(best, time.perf_counter() - t0)
        assert len(out) == n and "boxes" in out[0]
        log(f"{name}: {best*1e3:7.1f} ms/request ({best/n*1e3:6.1f} ms/img end-to-end)")


if __name__ == "__main__":
    main()
