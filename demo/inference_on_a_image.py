#!/usr/bin/env python
"""Single-image zero-shot inference demo.

Parity with `demo/inference_on_a_image.py:122-172`: load model + image, run
grounding with a text prompt, threshold boxes/phrases, save an annotated
image and print timings.

Usage:
  python demo/inference_on_a_image.py \
      -c dualzerorepbranchgroundingdino \
      -p groundingdino_swint_ogc.pth --vocab vocab.txt \
      -i image.jpg -t "a cat. a dog." -o out/
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", "-c", default="groundingdino")
    ap.add_argument("--checkpoint", "-p", required=True)
    ap.add_argument("--vocab", required=True, help="bert-base-uncased vocab.txt")
    ap.add_argument("--image", "-i", required=True)
    ap.add_argument("--text", "-t", default=None,
                    help="free-form caption (phrase-decode mode)")
    ap.add_argument("--classes", default=None,
                    help="comma-separated class names (per-class logits mode, "
                         "like demo/inference_on_a_image_multi_classes.py)")
    ap.add_argument("--output-dir", "-o", default="outputs")
    ap.add_argument("--box-threshold", type=float, default=0.3)
    ap.add_argument("--text-threshold", type=float, default=0.25)
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--config-overrides", default=None,
                    help="json file {'model': {...}} applied on top of the "
                         "preset — tiny-config dev runs/tests")
    args = ap.parse_args()

    if args.cpu_only:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from ziragroundingdino_tpu.utils.inference import (
        annotate,
        load_image,
        load_model,
        predict,
    )

    if not args.text and not args.classes:
        ap.error("one of --text or --classes is required")

    model_ov = {}
    dcfg = None
    if args.config_overrides:
        from ziragroundingdino_tpu.config import DataConfig, load_config_overrides

        model_ov, data_ov = load_config_overrides(args.config_overrides)
        if data_ov:
            dcfg = DataConfig(**data_ov)

    os.makedirs(args.output_dir, exist_ok=True)
    lm = load_model(args.checkpoint, args.vocab, preset=args.preset, **model_ov)
    image_source, (pixels, mask), size = (
        load_image(args.image) if dcfg is None else load_image(args.image, dcfg)
    )

    t0 = time.time()
    if args.classes:
        from ziragroundingdino_tpu.utils.inference import predict_classes

        class_names = [c.strip() for c in args.classes.split(",") if c.strip()]
        boxes, scores, phrases = predict_classes(
            lm, pixels, mask, class_names, box_threshold=args.box_threshold,
        )
    else:
        boxes, scores, phrases = predict(
            lm, pixels, mask, args.text,
            box_threshold=args.box_threshold, text_threshold=args.text_threshold,
        )
    print("time:", time.time() - t0)

    annotated = annotate(image_source, boxes, scores, phrases)
    out_path = os.path.join(args.output_dir, "pred.jpg")
    Image.fromarray(annotated).save(out_path)
    pred = {"boxes": boxes.tolist(), "scores": scores.tolist(), "phrases": phrases}
    with open(os.path.join(args.output_dir, "pred.json"), "w") as f:
        json.dump(pred, f, indent=2)
    print(json.dumps(pred, indent=2))
    print("saved:", out_path)


if __name__ == "__main__":
    main()
