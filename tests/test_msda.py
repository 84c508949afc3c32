"""MSDA kernel parity tests.

Oracle: torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)`` composition — the reference's golden CPU path
(`ms_deform_attn.py:90-130`). Torch here is a test oracle only; the framework
itself is torch-free.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.ops.msda import ms_deform_attn_xla, multi_scale_deformable_attention

SHAPES = ((8, 8), (4, 4), (2, 2))  # (H, W) per level


def _rand_inputs(rng, B=2, Q=16, H=4, D=8, P=3, shapes=SHAPES, loc_span=1.4):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    # sample locations beyond [0,1] to exercise zero-padding edges
    locs = (rng.random((B, Q, H, L, P, 2)).astype(np.float32) - 0.2) * loc_span
    attn = rng.random((B, Q, H, L, P)).astype(np.float32)
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    return value, locs, attn


def _torch_oracle(value, shapes, locs, attn):
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    attn = torch.from_numpy(attn)
    bs, _, num_heads, d = value.shape
    _, q, _, L, p, _ = locs.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(bs * num_heads, d, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # bs*H, q, p, 2
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    aw = attn.transpose(1, 2).reshape(bs * num_heads, 1, q, L * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
    out = out.view(bs, num_heads * d, q)
    return out.transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize("loc_span", [1.0, 1.4])
def test_msda_xla_matches_grid_sample(loc_span):
    rng = np.random.default_rng(0)
    value, locs, attn = _rand_inputs(rng, loc_span=loc_span)
    ours = np.asarray(ms_deform_attn_xla(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)))
    ref = _torch_oracle(value, SHAPES, locs, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_msda_jit_and_grad():
    rng = np.random.default_rng(1)
    value, locs, attn = _rand_inputs(rng)

    @jax.jit
    def f(v, l, a):
        return multi_scale_deformable_attention(v, SHAPES, l, a).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
    # finite-difference check on the value gradient (linear in value -> exact)
    eps = 1e-3
    dv = rng.standard_normal(value.shape).astype(np.float32)
    f0 = f(jnp.asarray(value - eps * dv), jnp.asarray(locs), jnp.asarray(attn))
    f1 = f(jnp.asarray(value + eps * dv), jnp.asarray(locs), jnp.asarray(attn))
    fd = (f1 - f0) / (2 * eps)
    analytic = jnp.vdot(g[0], jnp.asarray(dv))
    np.testing.assert_allclose(float(fd), float(analytic), rtol=1e-2, atol=1e-2)


def test_msda_grad_locations_fd():
    """Sampling-location gradients match finite differences (interior points)."""
    rng = np.random.default_rng(2)
    value, locs, attn = _rand_inputs(rng, B=1, Q=4, H=2, D=4, P=2, loc_span=0.6)
    locs = np.clip(locs, 0.15, 0.85)  # keep FD step away from texel boundaries

    def f(l):
        return ms_deform_attn_xla(jnp.asarray(value), SHAPES, l, jnp.asarray(attn)).sum()

    g = jax.grad(f)(jnp.asarray(locs))
    eps = 1e-4
    dl = rng.standard_normal(locs.shape).astype(np.float32)
    fd = (f(jnp.asarray(locs + eps * dl)) - f(jnp.asarray(locs - eps * dl))) / (2 * eps)
    analytic = jnp.vdot(g, jnp.asarray(dl))
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2, atol=2e-2)


def test_msda_bf16_runs():
    rng = np.random.default_rng(3)
    value, locs, attn = _rand_inputs(rng)
    out = ms_deform_attn_xla(
        jnp.asarray(value, jnp.bfloat16), SHAPES, jnp.asarray(locs), jnp.asarray(attn)
    )
    assert out.dtype == jnp.bfloat16
    ref = _torch_oracle(value, SHAPES, locs, attn)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.05, atol=0.05)


def test_quad_matches_naive():
    """Quad-packed fast path == naive gather path, including out-of-range
    sampling locations (zero padding semantics)."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_xla_quad

    rng = np.random.RandomState(3)
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(h * w for h, w in shapes)
    b, h, d, q, p = 2, 4, 8, 11, 3
    value = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    # locations straddling [0,1] to exercise border/validity logic
    loc = jnp.asarray(rng.uniform(-0.3, 1.3, size=(b, q, h, len(shapes), p, 2)), jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.randn(b, q, h, len(shapes) * p), jnp.float32), axis=-1
    ).reshape(b, q, h, len(shapes), p)
    ref = ms_deform_attn_xla(value, shapes, loc, w)
    got = ms_deform_attn_xla_quad(value, shapes, loc, w, q_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_autodiff():
    """The hand-written backward (`ms_deform_attn_quad`) must reproduce
    autodiff through the quad forward for every input cotangent — the TPU
    equivalent of checking the reference's col2im kernels against the
    autograd of its grid_sample fallback."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad, ms_deform_attn_xla_quad

    rng = np.random.default_rng(3)
    value, locs, attn = _rand_inputs(rng, B=2, Q=16, H=4, D=8, P=3)

    def loss_custom(v, l, a):
        out = ms_deform_attn_quad(jnp.asarray(v), SHAPES, jnp.asarray(l), jnp.asarray(a))
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_auto(v, l, a):
        out = ms_deform_attn_xla_quad(jnp.asarray(v), SHAPES, jnp.asarray(l), jnp.asarray(a))
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gc = jax.jit(jax.grad(loss_custom, argnums=(0, 1, 2)))(value, locs, attn)
    ga = jax.jit(jax.grad(loss_auto, argnums=(0, 1, 2)))(value, locs, attn)
    for name, c, a in zip(("value", "loc", "attn"), gc, ga):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_custom_vjp_chunked_matches_unchunked():
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    rng = np.random.default_rng(5)
    value, locs, attn = _rand_inputs(rng, B=1, Q=33, H=2, D=8, P=2)

    def loss(qc):
        def f(v, l, a):
            out = ms_deform_attn_quad(
                jnp.asarray(v), SHAPES, jnp.asarray(l), jnp.asarray(a), qc
            )
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))(value, locs, attn)

    g0 = loss(0)
    g8 = loss(8)
    for c, a in zip(g0, g8):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_custom_vjp_saved_rows_matches_autodiff():
    """The saved-rows residual mode (rows kept from the forward; backward
    skips table rebuild + regather) must produce identical gradients to the
    memory-lean regather mode. Shapes sit above the 1<<20 small-batch gate
    so `_quad_fwd` actually takes the saved path (B*Q*H*K = 2^21)."""
    from ziragroundingdino_tpu.ops.msda import (
        ms_deform_attn_quad, ms_deform_attn_xla_quad)

    rng = np.random.default_rng(7)
    value, locs, attn = _rand_inputs(rng, B=2, Q=8192, H=4, D=8, P=8,
                                     shapes=((16, 16), (8, 8)))

    def loss_fn(f):
        def loss(v, l, a):
            out = f(jnp.asarray(v), ((16, 16), (8, 8)),
                    jnp.asarray(l), jnp.asarray(a))
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, locs, attn)

    import ziragroundingdino_tpu.ops.msda as msda_mod
    assert os.environ.get("ZGDINO_MSDA_SAVE_ROWS", "1") == "1"
    gc = loss_fn(ms_deform_attn_quad)      # saved-rows custom VJP
    ga = loss_fn(ms_deform_attn_xla_quad)  # autodiff oracle
    for name, c, a in zip(("value", "loc", "attn"), gc, ga):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4, err_msg=name
        )


@pytest.mark.parametrize("env", [
    {"ZGDINO_MSDA_CONV_TABLE": "1"},
    {"ZGDINO_MSDA_PER_CHAIN_COORDS": "1"},
    {"ZGDINO_MSDA_FLAT_GATHER": "1"},
    {"ZGDINO_MSDA_FLAT_GATHER": "1", "ZGDINO_MSDA_PER_CHAIN_COORDS": "1"},
    {"ZGDINO_MSDA_CONV_TABLE": "1", "ZGDINO_MSDA_PER_CHAIN_COORDS": "1"},
])
def test_small_batch_experimental_paths_exact(env, monkeypatch):
    """The env-gated r3 perf experiments (conv-built quad table, per-chain
    coords, flat 2-D-start gather) are numerics-identical to the default
    small-batch path: the conv kernel is one-hot (one product per output,
    exact in any dtype) and the gather reads the same rows."""
    from ziragroundingdino_tpu.ops.msda import _quad_small_batch

    rng = np.random.default_rng(11)
    value, locs, attn = _rand_inputs(rng, B=2, Q=64, H=4, D=8, P=4)
    ref = np.asarray(_quad_small_batch(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)))
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    got = np.asarray(_quad_small_batch(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)))
    np.testing.assert_array_equal(got, ref)


def test_quad_table_build_conv_matches_split():
    from ziragroundingdino_tpu.ops.msda import (
        _quad_table_build_conv, _quad_table_build_split)

    rng = np.random.default_rng(12)
    B, H, D = 2, 4, 8
    S = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    split = _quad_table_build_split(value, SHAPES)
    conv = _quad_table_build_conv(value, SHAPES)
    for a, b in zip(conv, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    flat = _quad_table_build_conv(value, SHAPES, head_major=False)
    for lv, (h, w) in enumerate(SHAPES):
        qs = (h + 1) * (w + 1)
        got = np.asarray(flat[lv]).reshape(B, qs, H, 4 * D)
        np.testing.assert_array_equal(
            np.moveaxis(got, 2, 1), np.asarray(split[lv]))


@pytest.mark.parametrize("save_rows", ["1", "0"])
def test_bwd_per_chain_coords_exact(save_rows, monkeypatch):
    """ZGDINO_MSDA_BWD_PER_CHAIN_COORDS produces bit-identical gradients on
    both residual modes (saved-rows and regather) — it only changes where
    idx/wts/g4 slices are materialized."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    rng = np.random.default_rng(21)
    value, locs, attn = _rand_inputs(rng, B=2, Q=8192, H=4, D=8, P=8,
                                     shapes=((16, 16), (8, 8)))

    def grads():
        def loss(v, l, a):
            out = ms_deform_attn_quad(
                jnp.asarray(v), ((16, 16), (8, 8)), jnp.asarray(l),
                jnp.asarray(a))
            return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, locs, attn)

    monkeypatch.setenv("ZGDINO_MSDA_SAVE_ROWS", save_rows)
    ref = grads()
    monkeypatch.setenv("ZGDINO_MSDA_BWD_PER_CHAIN_COORDS", "1")
    got = grads()
    for name, a, b in zip(("value", "loc", "attn"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_bwd_per_level_scatter_exact(monkeypatch):
    """ZGDINO_MSDA_PER_LEVEL_SCATTER splits the backward's d_table scatter
    into per-level scatters (the K axis is level-major) — identical sums."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    rng = np.random.default_rng(23)
    value, locs, attn = _rand_inputs(rng, B=2, Q=32, H=4, D=8, P=4)

    def grads():
        def loss(v, l, a):
            out = ms_deform_attn_quad(jnp.asarray(v), SHAPES, jnp.asarray(l),
                                      jnp.asarray(a))
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, locs, attn)

    ref = grads()
    monkeypatch.setenv("ZGDINO_MSDA_PER_LEVEL_SCATTER", "1")
    got = grads()
    for name, a, b in zip(("value", "loc", "attn"), ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_bf16_vjp_drift_bounded(monkeypatch):
    """f32-vs-bf16 gradient drift on the MSDA custom VJP at encoder-like
    scale (VERDICT r3 item 5). Measured (seed 31, Q=1360/H=4/D=32/P=4):
    d_value 4.0% norm-wise vs f32, of which the default-on bf16 scatter
    accumulator contributes only 1.2% (validating the ~0.8% order-of-
    magnitude claim in the `ops/msda.py` backward docstring — input
    rounding, not the accumulator, dominates); d_attn 3.6%; d_loc ~32%
    (corner differences of bf16-rounded values divided by cell sizes —
    inherent to bf16 compute, not the accumulator; convergence under this
    noise is covered by test_learning.py::test_bf16_training_converges)."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    shapes = ((32, 32), (16, 16), (8, 8), (4, 4))
    rng = np.random.default_rng(31)
    value, locs, attn = _rand_inputs(rng, B=1, Q=1360, H=4, D=32, P=4,
                                     shapes=shapes, loc_span=1.0)

    def grads(dtype, bf16_scatter):
        monkeypatch.setenv("ZGDINO_MSDA_BF16_SCATTER",
                           "1" if bf16_scatter else "0")

        def loss(v, l, a):
            out = ms_deform_attn_quad(v.astype(dtype), shapes,
                                      l.astype(dtype), a.astype(dtype))
            probe = jnp.cos(jnp.arange(out.size).reshape(out.shape))
            return jnp.sum(out.astype(jnp.float32) * probe)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))

    g32 = grads(jnp.float32, bf16_scatter=False)
    gbf = grads(jnp.bfloat16, bf16_scatter=True)
    gbf_f32acc = grads(jnp.bfloat16, bf16_scatter=False)

    def rel(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    # total drift vs the f32 oracle (input rounding + accumulator)
    assert rel(gbf[0], g32[0]) < 6e-2, rel(gbf[0], g32[0])
    assert rel(gbf[2], g32[2]) < 6e-2, rel(gbf[2], g32[2])
    # d_loc differences corner values -> much noisier under bf16 inputs
    assert rel(gbf[1], g32[1]) < 0.5, rel(gbf[1], g32[1])
    # the bf16 ACCUMULATOR's own contribution, isolated from input rounding
    assert rel(gbf[0], gbf_f32acc[0]) < 2e-2, rel(gbf[0], gbf_f32acc[0])


@pytest.mark.parametrize("hg,unroll", [(1, "0"), (2, "0"), (2, "1")])
def test_img_head_group_exact(hg, unroll, monkeypatch):
    """ZGDINO_MSDA_IMG_HEAD_GROUP splits each per-image gather table into
    H/hg head-group tables (smaller tables ride the gather-rate cliff);
    the group-wise f32 reduce then concat is the same math as the whole-
    image weighted gather. Also exercised combined with IMG_UNROLL — the
    b8_unroll_hg2 A/B leg's exact configuration."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_xla_quad

    rng = np.random.default_rng(43)
    value, locs, attn = _rand_inputs(rng, B=4, Q=64, H=4, D=8, P=4)
    args = (jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn))
    ref = np.asarray(ms_deform_attn_xla_quad(*args))
    monkeypatch.setenv("ZGDINO_MSDA_IMG_HEAD_GROUP", str(hg))
    monkeypatch.setenv("ZGDINO_MSDA_IMG_UNROLL", unroll)
    got = np.asarray(ms_deform_attn_xla_quad(*args))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_allfwd_combo_grads_exact(monkeypatch):
    """The combined winner-candidate configuration from the round-4 A/B
    queue (`t_allfwd`: CONV_TABLE + PER_CHAIN_COORDS forward with
    BWD_PER_CHAIN_COORDS backward) yields gradients identical to the
    all-default custom VJP — each gate is individually bit-exact and they
    compose without interaction."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    rng = np.random.default_rng(47)
    value, locs, attn = _rand_inputs(rng, B=2, Q=8192, H=4, D=8, P=8,
                                     shapes=((16, 16), (8, 8)))

    def grads():
        def loss(v, l, a):
            out = ms_deform_attn_quad(
                jnp.asarray(v), ((16, 16), (8, 8)), jnp.asarray(l),
                jnp.asarray(a))
            return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, locs, attn)

    ref = grads()
    monkeypatch.setenv("ZGDINO_MSDA_CONV_TABLE", "1")
    monkeypatch.setenv("ZGDINO_MSDA_PER_CHAIN_COORDS", "1")
    monkeypatch.setenv("ZGDINO_MSDA_BWD_PER_CHAIN_COORDS", "1")
    got = grads()
    for name, a, b in zip(("value", "loc", "attn"), ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_small_min_decoder_routing_exact(monkeypatch):
    """ZGDINO_MSDA_SMALL_MIN lowers the per-(b,h)-chain threshold so
    decoder-scale calls (B*Q*H*K below 1<<20) take the unrolled chain path
    instead of one whole-table gather — same math, and the custom VJP's
    saved-rows residual engages on the rerouted call too."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_quad

    rng = np.random.default_rng(53)
    # decoder-like: small Q over a multi-level map, B*Q*H*K = 2*64*4*8=4096
    value, locs, attn = _rand_inputs(rng, B=2, Q=64, H=4, D=8, P=4)

    def fwd_and_grads():
        args = (jnp.asarray(value), SHAPES, jnp.asarray(locs),
                jnp.asarray(attn))
        out = np.asarray(ms_deform_attn_quad(*args))

        def loss(v, l, a):
            o = ms_deform_attn_quad(jnp.asarray(v), SHAPES, jnp.asarray(l),
                                    jnp.asarray(a))
            return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, locs, attn)
        return out, g

    ref_out, ref_g = fwd_and_grads()
    monkeypatch.setenv("ZGDINO_MSDA_SMALL_MIN", "1024")
    got_out, got_g = fwd_and_grads()
    np.testing.assert_allclose(got_out, ref_out, rtol=1e-6, atol=1e-6)
    for name, a, b in zip(("value", "loc", "attn"), ref_g, got_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_img_unroll_exact(monkeypatch):
    """ZGDINO_MSDA_IMG_UNROLL python-unrolls the B>2 per-image loop (scan
    bodies don't pipeline on v5e) — same math as the lax.scan (only
    fusion-order f32 noise, observed 6e-8)."""
    from ziragroundingdino_tpu.ops.msda import ms_deform_attn_xla_quad

    rng = np.random.default_rng(41)
    value, locs, attn = _rand_inputs(rng, B=4, Q=32, H=4, D=8, P=4)
    args = (jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn))
    ref = np.asarray(ms_deform_attn_xla_quad(*args))
    monkeypatch.setenv("ZGDINO_MSDA_IMG_UNROLL", "1")
    got = np.asarray(ms_deform_attn_xla_quad(*args))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
