"""Pipeline-parallel (GPipe encoder) EQUALITY vs single device.

The reference has NO pipeline parallelism — DDP is its only scaling axis
(`train_net.py:75-131`; SURVEY §2.5). parallel/pp.py goes beyond parity:
the feature-enhancer layer stack is sharded over a `pipe` mesh axis with
stacked per-stage parameter subtrees, and microbatches flow through a
lax.scan whose per-step `jnp.roll` on the pipe-sharded dim lowers to a
nearest-neighbour collective-permute.

Same bar as the TP/SP tests: the pipelined forward and a full train step
must be numerically EQUAL to the single-device computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.common import tiny_config
from tests.test_train_step import make_batch
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.parallel import pp
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
    # enc_layers=4 so a pipe=4 mesh gets one layer per stage
    cfg = tiny_config(
        modelname="dualzerorepbranchgroundingdino",
        cet_middle_dim=16,
        enc_layers=4,
    )
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


def test_pp_forward_equality(setup):
    """mesh(data=2, pipe=4) eval forward == single-device forward."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, pipe=4, devices=jax.devices()[:8])

    def fwd_fn(p, b):
        return model.apply(
            {"params": p}, b["pixels"], b["mask"], _text(b),
            train=False, deterministic=True)

    ref = jax.jit(fwd_fn)(params, batch)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    with pp.pipeline_parallel(mesh, microbatches=2):
        out = jax.jit(fwd_fn)(p_sh, b_sh)
        jax.block_until_ready(out)

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"], np.float32),
        np.asarray(ref["pred_boxes"], np.float32), atol=2e-5,
    )
    l_sh = np.asarray(out["pred_logits"], np.float32)
    l_ref = np.asarray(ref["pred_logits"], np.float32)
    assert np.max(np.abs(l_sh - l_ref)) < 1e-3, np.max(np.abs(l_sh - l_ref))


def test_pp_train_step_equality(setup):
    """One full train step under pipeline_parallel(mesh(data=2, pipe=4)) ==
    single device: same loss, same updated trainable params. The backward is
    GPipe-through-scan: jax.grad differentiates the whole pipeline schedule."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, pipe=4, devices=jax.devices()[:8])

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
    with pp.pipeline_parallel(mesh, microbatches=2):
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
        assert d <= tol + 1e-12, f"{name}: PP vs single diverges by {d}"


def test_pp_actually_pipelines(setup):
    """Anti-vacuity: the compiled PP forward must contain a collective-permute
    (the GPipe shift on the pipe-sharded state) — i.e. XLA did not silently
    replicate the pipeline."""
    _, model, params, batch = setup
    mesh = make_mesh(data=2, pipe=4, devices=jax.devices()[:8])

    def fwd_fn(p, b):
        return model.apply(
            {"params": p}, b["pixels"], b["mask"], _text(b),
            train=False, deterministic=True)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    with pp.pipeline_parallel(mesh, microbatches=2):
        compiled = jax.jit(fwd_fn).lower(p_sh, b_sh).compile()
    hlo = compiled.as_text()
    assert "collective-permute" in hlo or "all-to-all" in hlo, (
        "no pipe-shift collectives in the compiled PP program — the pipeline "
        "is vacuous"
    )


def test_pp_rejects_seq_combo(setup):
    """pp asserts the sp context is off (they shard the same activations)."""
    from ziragroundingdino_tpu.parallel import sp

    _, model, params, batch = setup
    mesh = make_mesh(data=1, pipe=4, seq=2, devices=jax.devices()[:8])

    def fwd_fn(p, b):
        return model.apply(
            {"params": p}, b["pixels"], b["mask"], _text(b),
            train=False, deterministic=True)

    with sp.sequence_parallel(mesh), pp.pipeline_parallel(mesh):
        with pytest.raises(AssertionError, match="mutually exclusive"):
            jax.jit(fwd_fn)(params, batch)
