#!/usr/bin/env python
"""Standalone COCO-style evaluation (the reference's `--eval-only` path,
`train_net.py:174-206` do_test -> `evaluation/evaluator.py:82-158`).

Evaluates a checkpoint on any COCO/LVIS-format dataset, printing the 12
COCO metrics + images/sec and the per-category AP table, and writing
result.json.

Usage:
  python scripts/eval_coco.py --checkpoint groundingdino_swint_ogc.pth \
      --vocab vocab.txt --json instances_val2017.json --image-root val2017/ \
      [--preset dualzerorepbranchgroundingdino] [--batch-size 2] \
      [--lvis] [--output result.json]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import argparse
import json
import logging


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--json", required=True, help="COCO/LVIS instances json")
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--preset", default="dualzerorepbranchgroundingdino")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--max-images", type=int, default=0,
                    help="evaluate only the first N images (0 = all)")
    ap.add_argument("--output", default=None, help="write metrics json here")
    ap.add_argument("--config-overrides", default=None,
                    help="json file {'model': {...}, 'data': {...}}")
    ap.add_argument("--select-k", type=int, default=0,
                    help="top-k detections per image (0 = preset value)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="data-parallel eval over N devices (batch-size "
                         "must divide by N)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax

    if os.environ.get("ZGDINO_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ZGDINO_PLATFORM"])

    from ziragroundingdino_tpu.config import DataConfig
    from ziragroundingdino_tpu.data.coco import CocoDataset
    from ziragroundingdino_tpu.data.loader import DataLoader
    from ziragroundingdino_tpu.eval.evaluator import (
        inference_on_dataset,
        make_inference_fn,
    )
    from ziragroundingdino_tpu.utils.inference import load_model

    model_ov, data_ov = {}, {}
    if args.config_overrides:
        from ziragroundingdino_tpu.config import load_config_overrides

        model_ov, data_ov = load_config_overrides(args.config_overrides)

    lm = load_model(args.checkpoint, args.vocab, preset=args.preset, **model_ov)
    cfg = lm.cfg
    dcfg = DataConfig(**data_ov)

    ds = CocoDataset.from_json(args.json, args.image_root)
    if args.max_images:
        ds.images = ds.images[: args.max_images]
    logging.info("dataset: %d images, %d categories", len(ds), len(ds.category_names))

    loader = DataLoader(
        ds, lm.tokenizer, dcfg, batch_size=args.batch_size, train=False,
        max_text_len=cfg.max_text_len, max_categories=cfg.max_categories,
    )
    select_k = args.select_k or cfg.select_box_nums_for_evaluation
    inference_fn = make_inference_fn(lm.model, select_k=select_k)
    params = lm.params
    if args.mesh:
        from ziragroundingdino_tpu.parallel.mesh import make_mesh
        from ziragroundingdino_tpu.parallel.sharded_eval import (
            make_sharded_inference_fn,
        )

        if args.batch_size % args.mesh:
            raise SystemExit(
                f"--batch-size {args.batch_size} must divide by --mesh {args.mesh}")
        mesh = make_mesh(data=args.mesh, model=1)
        sharded = make_sharded_inference_fn(inference_fn, mesh, params)
        inference_fn = lambda p, b: sharded(b)  # params baked in, replicated
    res = inference_on_dataset(
        params, iter(loader), inference_fn,
        num_classes=len(ds.category_names),
        class_names=ds.category_names,
    )
    print(json.dumps({k: v for k, v in res.items()
                      if not isinstance(v, dict)}, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(res, f, indent=2)
        print("saved:", args.output)


if __name__ == "__main__":
    main()
