"""Dump optimized HLO (with source metadata) for the flagship forward.

Used to map the diffuse non-MSDA tail fusions back to model source lines.
Compiles via the persistent cache path (same jit signature as bench_infer)
and writes `compiled.as_text()` — no XLA dump flags, so the cache still
hits and this is cheap after any prior full-size run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_hlo.txt"
    b = int(os.environ.get("B", "1"))
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _text_arrays
    from ziragroundingdino_tpu.models import build_model
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    model = build_model("dualzerorepbranchgroundingdino")
    h, w, t = 800, 1216, 64
    text_np, _ = _text_arrays(np, 1, t, vocab=30000)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    mask = jnp.ones((b, h, w), bool)
    text = {k: jnp.asarray(np.repeat(v, b, axis=0)) for k, v in text_np.items()}
    params = jax.eval_shape(lambda k: model.init(k, pixels[:1], mask[:1],
                                                 {k2: v[:1] for k2, v in text.items()}),
                            jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)

    def fwd(params, pixels, mask, text, jitter):
        out = model.apply(params, pixels + jitter * 1e-6, mask, text)
        return jnp.sum(out["pred_boxes"]) + jnp.sum(out["pred_logits"][..., :4])

    lowered = jax.jit(fwd).lower(params, pixels, mask, text, jnp.float32(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(out_path, len(txt), "bytes")


if __name__ == "__main__":
    main()
