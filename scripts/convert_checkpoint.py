#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint to a native Orbax checkpoint.

One-way bridge for e.g. `groundingdino_swint_ogc.pth` (SURVEY §5 checkpoint
subsystem): applies the rule-based key map, reports strict=False-style
mismatches, and writes {params, prompt_memory, learned_classes}.

Usage:
  python scripts/convert_checkpoint.py --torch ckpt.pth --out ckpt_jax/ \
      --preset dualzerorepbranchgroundingdino
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--preset", default="dualzerorepbranchgroundingdino")
    ap.add_argument("--cpu-only", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    if args.cpu_only:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ziragroundingdino_tpu.models import build_model
    from ziragroundingdino_tpu.text.masks import generate_special_token_masks
    from ziragroundingdino_tpu.utils.torch_convert import load_torch_checkpoint, merge_into

    model = build_model(args.preset)
    cfg = model.cfg

    ids = np.zeros((1, 8), np.int32)
    ids[0, :4] = [101, 1000, 1012, 102]
    m = generate_special_token_masks(ids, max_categories=cfg.max_categories)
    text = {
        "input_ids": jnp.asarray(ids),
        "text_token_mask": jnp.asarray(ids > 0),
        "position_ids": jnp.asarray(m["position_ids"]),
        "text_self_attention_masks": jnp.asarray(m["text_self_attention_masks"]),
    }
    # image must carry >= num_queries multi-scale tokens (900 -> 128px min)
    pixels = jnp.zeros((1, 128, 128, 3), jnp.float32)
    mask = jnp.ones((1, 128, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), pixels, mask, text)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    tree, batch_stats, prompt_memory, unmatched = load_torch_checkpoint(args.torch)
    problems = merge_into(params, tree)
    print(f"unmatched torch keys: {len(unmatched)}")
    for k in unmatched[:20]:
        print("  -", k)
    print(f"merge problems: {len(problems)}")
    for p in problems[:20]:
        print("  -", p)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if prompt_memory:
        payload["prompt_memory"] = {k: np.asarray(v) for k, v in prompt_memory.items()}
    if batch_stats:
        payload["batch_stats"] = batch_stats
    out = os.path.abspath(args.out)
    ckptr.save(out, payload, force=True)
    ckptr.wait_until_finished()
    meta = {
        "preset": args.preset,
        "unmatched": unmatched,
        "problems": problems,
        "learned_classes": sorted(k.strip("-") for k in prompt_memory),
    }
    with open(out + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    print("saved:", out)


if __name__ == "__main__":
    main()
