#!/usr/bin/env python
"""Overlay predictions from a result json onto images.

Parity with `visualize_json_results.py` (reference repo root): reads
detections (COCO result format: image_id, bbox xywh, score, category_id),
draws the top-scoring boxes per image, writes annotated jpgs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import argparse
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="COCO-format results json")
    ap.add_argument("--dataset-json", required=True, help="instances json (for file names)")
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--conf-threshold", type=float, default=0.3)
    ap.add_argument("--max-images", type=int, default=50)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image, ImageDraw

    with open(args.dataset_json) as f:
        coco = json.load(f)
    id_to_file = {im["id"]: im["file_name"] for im in coco["images"]}
    id_to_cat = {c["id"]: c["name"] for c in coco.get("categories", [])}

    with open(args.input) as f:
        results = json.load(f)
    by_image = defaultdict(list)
    for r in results:
        if r.get("score", 1.0) >= args.conf_threshold:
            by_image[r["image_id"]].append(r)

    os.makedirs(args.output, exist_ok=True)
    for n, (img_id, dets) in enumerate(sorted(by_image.items())):
        if n >= args.max_images:
            break
        path = os.path.join(args.image_root, id_to_file[img_id])
        img = Image.open(path).convert("RGB")
        draw = ImageDraw.Draw(img)
        for d in sorted(dets, key=lambda x: -x.get("score", 1.0)):
            x, y, w, h = d["bbox"]
            draw.rectangle([x, y, x + w, y + h], outline=(255, 0, 0), width=2)
            label = id_to_cat.get(d.get("category_id"), str(d.get("category_id")))
            draw.text((x, max(y - 12, 0)), f"{label} {d.get('score', 0):.2f}",
                      fill=(255, 0, 0))
        img.save(os.path.join(args.output, os.path.basename(id_to_file[img_id])))
    print(f"wrote {min(len(by_image), args.max_images)} images to {args.output}")


if __name__ == "__main__":
    main()
