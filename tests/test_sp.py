"""Sequence-parallel EQUALITY vs single device.

The reference has NO sequence/context parallelism (SURVEY §2.5: text capped
at 256 tokens, image tokens handled by deformable sparsity; activation
checkpointing is its only long-sequence mitigation,
`transformer_for_adapter.py:578-586,629-638`). parallel/sp.py goes beyond
parity: encoder tokens shard over a `seq` mesh axis (constraint-pinned
LN/FFN, query-sharded MSDA via shard_map with a replicated value table).

Same bar as the TP tests: the sharded forward and a full train step must be
numerically EQUAL to the single-device computation — "runs" is not evidence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.common import tiny_config
from tests.test_train_step import make_batch
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.parallel import sp
from ziragroundingdino_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
)
from ziragroundingdino_tpu.train.optim import (
    ZIRA_TRAINABLE_PATTERNS,
    trainable_mask,
)
from ziragroundingdino_tpu.train.step import compute_losses

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_config(modelname="dualzerorepbranchgroundingdino", cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    batch = make_batch(b=4)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["mask"],
        {k: batch[k] for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks")},
    )
    return cfg, model, variables["params"], batch


def _text(batch):
    return {k: batch[k] for k in (
        "input_ids", "text_token_mask", "position_ids",
        "text_self_attention_masks")}


def test_msda_query_sharded_exactness():
    """The shard_map-wrapped op (incl. Q padding) == the plain op, bitwise-
    close, on a seq=4 mesh with Q NOT divisible by 4."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, seq=4, devices=jax.devices()[:8])
    from ziragroundingdino_tpu.ops.msda import multi_scale_deformable_attention

    rng = np.random.RandomState(0)
    b, h, hd, q = 2, 2, 8, 37  # 37 % 4 != 0 -> exercises the zero-pad path
    shapes = ((4, 6), (2, 3))
    s = sum(a * c for a, c in shapes)
    value = jnp.asarray(rng.randn(b, s, h, hd), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (b, q, h, len(shapes), 4, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.randn(b, q, h, len(shapes), 4), jnp.float32))

    ref = jax.jit(lambda v, l, a: multi_scale_deformable_attention(v, shapes, l, a))(
        value, loc, w)

    with sp.sequence_parallel(mesh):
        out = jax.jit(
            lambda v, l, a: sp.msda_query_sharded(v, shapes, l, a)
        )(value, loc, w)

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sp_forward_equality(setup):
    """mesh(data=2, seq=4) eval forward == single-device forward."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, seq=4, devices=jax.devices()[:8])

    def fwd_fn(p, b):
        return model.apply(
            {"params": p}, b["pixels"], b["mask"], _text(b),
            train=False, deterministic=True)

    ref = jax.jit(fwd_fn)(params, batch)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    with sp.sequence_parallel(mesh):
        out = jax.jit(fwd_fn)(p_sh, b_sh)
        jax.block_until_ready(out)

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"], np.float32),
        np.asarray(ref["pred_boxes"], np.float32), atol=2e-5,
    )
    l_sh = np.asarray(out["pred_logits"], np.float32)
    l_ref = np.asarray(ref["pred_logits"], np.float32)
    assert np.max(np.abs(l_sh - l_ref)) < 1e-3, np.max(np.abs(l_sh - l_ref))


def test_sp_train_step_equality(setup):
    """One full train step under sequence_parallel(mesh(data=2, seq=4)) ==
    single device: same loss, same updated trainable params."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, seq=4, devices=jax.devices()[:8])

    tmask = trainable_mask(params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-3))

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            p = jax.tree_util.tree_map(
                lambda x, t: x if t else jax.lax.stop_gradient(x), p, tmask
            )
            return compute_losses(Wrap, p, batch, train=True)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), total

    opt0 = jax.jit(tx.init)(params)
    p_ref, loss_ref = jax.jit(train_step)(params, opt0, batch)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    opt_sh = jax.jit(tx.init)(p_sh)
    with sp.sequence_parallel(mesh):
        p_new, loss_sh = jax.jit(train_step)(p_sh, opt_sh, b_sh)
        jax.block_until_ready(loss_sh)

    assert abs(float(loss_sh) - float(loss_ref)) / max(abs(float(loss_ref)), 1e-6) < 1e-4, (
        float(loss_sh), float(loss_ref))

    flat_ref = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    flat_msk = dict(jax.tree_util.tree_leaves_with_path(tmask))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_new):
        a = np.asarray(leaf, np.float32)
        b = np.asarray(flat_ref[path], np.float32)
        tol = 2e-5 if flat_msk[path] else 0.0
        d = np.max(np.abs(a - b)) if a.size else 0.0
        name = "/".join(str(p) for p in path)
        assert d <= tol + 1e-12, f"{name}: SP vs single diverges by {d}"


def test_sp_actually_shards(setup):
    """Anti-vacuity: the compiled SP forward must contain seq-axis
    collectives (the per-layer value all-gather) — i.e. XLA did not silently
    replicate the whole computation."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, seq=4, devices=jax.devices()[:8])

    def fwd_fn(p, b):
        return model.apply(
            {"params": p}, b["pixels"], b["mask"], _text(b),
            train=False, deterministic=True)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    with sp.sequence_parallel(mesh):
        compiled = jax.jit(fwd_fn).lower(p_sh, b_sh).compile()
    hlo = compiled.as_text()
    assert "all-gather" in hlo or "all-to-all" in hlo, (
        "no seq collectives in the compiled SP program — sharding is vacuous"
    )
