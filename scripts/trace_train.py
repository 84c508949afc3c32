"""Train-step device trace: one step traced, per-category op-time summary.

Usage: python scripts/trace_train.py  (TPU; ~3 min with warm cache)
Follows the axon measurement rules (BASELINE.md): value-fetch sync.
"""

import sys, time, glob, collections, gzip, json, re
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _text_arrays
from ziragroundingdino_tpu.config import OptimizerConfig, ScheduleConfig
from ziragroundingdino_tpu.models import build_model
from ziragroundingdino_tpu.train.optim import ZIRA_TRAINABLE_PATTERNS, build_optimizer, trainable_mask
from ziragroundingdino_tpu.train.step import TrainState, make_train_step
from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

b, h, w, t = 1, 800, 1216, 64
model = build_model("dualzerorepbranchgroundingdino")
rng = np.random.RandomState(0)
text_np, c2t = _text_arrays(np, 1, t, vocab=30000)
n_gt = 8
batch = {
    "pixels": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
    "mask": jnp.ones((b, h, w), bool),
    **{k: jnp.asarray(np.repeat(v, b, axis=0)) for k, v in text_np.items()},
    "cate_to_token_mask": jnp.asarray(np.repeat(c2t[:, :16], b, axis=0)),
    "gt_labels": jnp.asarray(rng.randint(0, 8, size=(b, n_gt)), jnp.int32),
    "gt_boxes": jnp.asarray(np.clip(rng.rand(b, n_gt, 4) * [1,1,0.2,0.2] + [0,0,0.05,0.05], 0, 1), jnp.float32),
    "gt_valid": jnp.ones((b, n_gt), bool),
}
params = jax.jit(lambda k: model.init(k, batch["pixels"], batch["mask"],
    {k2: batch[k2] for k2 in ("input_ids","text_token_mask","position_ids","text_self_attention_masks")}))(jax.random.PRNGKey(0))
mask_t = trainable_mask(params["params"], ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
tx = build_optimizer(OptimizerConfig(lr=1e-3, grad_clip=0.1, lr_factors=(("freeze",0.2),)),
                     ScheduleConfig(max_iter=1000), params["params"], trainable=mask_t)
class Wrap:
    cfg = model.cfg
    @staticmethod
    def apply(p, *a, **k): return model.apply({"params": p}, *a, **k)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params["params"], opt_state=tx.init(params["params"]))
# donate=True matches production AND avoids double-buffering the
# params+opt state next to the ~4 GB saved-rows residuals (a
# donate=False run at 800x1216 OOM-crashed the relay worker, r3)
step = make_train_step(Wrap, tx, matcher_impl="jax", trainable=mask_t)
key = jax.random.PRNGKey(0)
state, m = step(state, batch, key); float(m["total_loss"])
t0=time.time(); state, m = step(state, batch, jax.random.fold_in(key,1)); float(m["total_loss"]); print("step ms:", (time.time()-t0)*1e3, flush=True)
with jax.profiler.trace("/tmp/tt3"):
    state, m = step(state, batch, jax.random.fold_in(key,2)); float(m["total_loss"])
f = sorted(glob.glob('/tmp/tt3/plugins/profile/*/vm.trace.json.gz'))[-1]
with gzip.open(f) as fh: tr = json.load(fh)
ev = [e for e in tr['traceEvents'] if e.get('ph')=='X' and e.get('dur') and e.get('pid')==3]
cat = collections.defaultdict(lambda: [0,0]); outer=0
for e in ev:
    n = e['name']
    if n.startswith('jit_') or n == '2':
        outer = max(outer, e['dur']); continue
    c = e.get('args', {}).get('hlo_category') or re.sub(r"[.\d]+$", "", n)
    a = cat[c]; a[0] += e['dur']; a[1] += 1
print(f"outer: {outer/1e3:.1f} ms")
for c, (d, cnt) in sorted(cat.items(), key=lambda kv: -kv[1][0])[:14]:
    print(f"{d/1e3:9.2f} ms x{cnt:6d}  {c[:50]}")
singles = sorted((e for e in ev if not e['name'].startswith(('jit_','while')) and e['name']!='2'), key=lambda e:-e['dur'])[:10]
for e in singles:
    print(f"  single {e['dur']/1e3:6.2f} ms {str(e.get('args',{}).get('long_name',''))[:110]}")
# top ops per interesting category, aggregated by op name
for want in ('data formatting', 'loop fusion', 'convolution fusion'):
    agg = collections.defaultdict(lambda: [0.0, 0, ''])
    for e in ev:
        c = e.get('args', {}).get('hlo_category')
        if c != want: continue
        a = agg[e['name']]; a[0] += e['dur']; a[1] += 1
        a[2] = str(e.get('args', {}).get('long_name', ''))[:150]
    print(f"== top {want} ==")
    for n,(d,cnt,ln) in sorted(agg.items(), key=lambda kv:-kv[1][0])[:12]:
        print(f"  {d/1e3:7.2f} ms x{cnt:5d} {n[:28]:28s} {ln}")
