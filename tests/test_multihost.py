"""Multi-host input pipeline: per-process sharding + global batch assembly.

Covers VERDICT round-1 item 8: the reference equivalent is per-rank NCCL
init + one DataLoader per process (`util/misc.py:577-635`); here every host
loads only its shard and `jax.make_array_from_process_local_data` assembles
the global data-sharded batch. The 2-process case runs as a real
`jax.distributed` CPU cluster in subprocesses.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ziragroundingdino_tpu.parallel.multihost import shard_indices_for_process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shard_indices_disjoint_and_covering(monkeypatch):
    import ziragroundingdino_tpu.parallel.multihost as mh

    shards = []
    for rank in range(2):
        monkeypatch.setattr(mh, "process_count", lambda: 2)
        monkeypatch.setattr(mh, "process_index", lambda r=rank: r)
        shards.append(mh.shard_indices_for_process(11, seed=7, epoch=3))
    a, b = shards
    assert len(set(a.tolist()) & set(b.tolist())) == 0
    assert len(a) == len(b) == 5  # drop_last: 10 usable of 11
    # same seed + epoch -> same permutation on every process
    monkeypatch.setattr(mh, "process_index", lambda: 0)
    again = mh.shard_indices_for_process(11, seed=7, epoch=3)
    np.testing.assert_array_equal(a, again)


def test_loader_shards_are_disjoint_slices_of_global_batch(tmp_path):
    from tests.common import tiny_tokenizer
    from ziragroundingdino_tpu.config import DataConfig
    from ziragroundingdino_tpu.data.loader import DataLoader

    class FakeDS:
        caption = "cat."
        category_names = ["cat"]

        def __len__(self):
            return 16

        def load_sample(self, i):
            from ziragroundingdino_tpu.data.transforms import Sample

            rng = np.random.RandomState(i)
            return Sample(
                image=(rng.rand(32, 48, 3) * 255).astype(np.uint8),
                boxes=np.asarray([[2.0, 2.0, 20.0, 20.0]], np.float32),
                labels=np.asarray([0]),
                image_id=i,
            )

    cfg = DataConfig(num_workers=0, shape_buckets=((64, 96),), max_boxes=4)
    loaders = [
        DataLoader(FakeDS(), tiny_tokenizer(), cfg, batch_size=4, train=True,
                   seed=3, max_text_len=32, max_categories=8,
                   shard_rank=r, shard_count=2)
        for r in range(2)
    ]
    its = [iter(l) for l in loaders]
    for _ in range(3):
        b0, b1 = next(its[0]), next(its[1])
        # equal local shapes (pinned bucket), local batch = global/2
        assert b0["pixels"].shape == b1["pixels"].shape
        assert b0["pixels"].shape[0] == 2
        ids0, ids1 = set(b0["image_ids"].tolist()), set(b1["image_ids"].tolist())
        assert not (ids0 & ids1), "shards must be disjoint"


WORKER = textwrap.dedent("""
    import json, os, sys
    # sitecustomize pre-imports jax (axon platform); the backend is not yet
    # initialized, so config.update still wins (same dance as conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %(repo)r)
    from ziragroundingdino_tpu.parallel.mesh import make_mesh
    from ziragroundingdino_tpu.parallel.multihost import (
        global_batch_from_local, local_batch_size, shard_indices_for_process,
    )

    assert jax.process_count() == 2 and len(jax.devices()) == 4
    mesh = make_mesh(data=4, model=1)
    assert local_batch_size(8) == 4

    idx = shard_indices_for_process(32, seed=11)
    # local shard of the global batch: value encodes (process, row)
    local = {
        "x": np.full((4, 3), pid * 100, np.float32) + np.arange(4)[:, None],
        "ids": np.asarray(idx[:4], np.int64).reshape(4, 1),
    }
    gb = global_batch_from_local(local, mesh)
    assert gb["x"].shape == (8, 3), gb["x"].shape

    @jax.jit
    def global_stats(b):
        return jnp.sum(b["x"]), jnp.sum(b["ids"])

    sx, si = global_stats(gb)
    json.dump({"pid": pid, "sum_x": float(sx), "sum_ids": int(si),
               "ids": np.asarray(idx[:4]).tolist()},
              open(out, "w"))
""")


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    outs = [tmp_path / f"out{p}.json" for p in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), str(port), str(outs[p])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    res = [json.load(open(o)) for o in outs]
    # both processes computed the same GLOBAL reductions over the assembled
    # batch: sum_x covers both hosts' rows (0..3 and 100..103)
    expected_x = sum(range(4)) * 3 + sum(range(100, 104)) * 3
    for r in res:
        assert r["sum_x"] == expected_x, res
    # the two processes' dataset shards are disjoint
    assert not (set(res[0]["ids"]) & set(res[1]["ids"])), res


TRAIN_WORKER = textwrap.dedent("""
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    import optax
    sys.path.insert(0, %(repo)r)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ziragroundingdino_tpu.parallel.mesh import make_mesh, param_sharding
    from ziragroundingdino_tpu.parallel.multihost import global_batch_from_local

    assert jax.process_count() == 2 and len(jax.devices()) == 4
    mesh = make_mesh(data=4, model=1)

    # a tiny real training step: linear regression with psum'd grads — the
    # full multi-host loop shape (per-host shard -> global array -> jit over
    # the mesh -> replicated update), without the big model's compile cost
    rng = np.random.RandomState(0)
    w0 = np.zeros((3, 1), np.float32)
    params = jax.device_put(jnp.asarray(w0), NamedSharding(mesh, P()))
    tx = optax.sgd(0.1)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(w, b):
        pred = b["x"] @ w
        return jnp.mean((pred - b["y"]) ** 2)

    @jax.jit
    def step(w, opt_state, b):
        l, g = jax.value_and_grad(loss_fn)(w, b)
        updates, opt_state = tx.update(g, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, l

    # each process holds a DIFFERENT deterministic shard of the global batch
    losses = []
    for it in range(3):
        xs = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10 + it
        ys = (xs @ np.asarray([[1.0], [2.0], [3.0]])) + 0.5
        lo, hi = pid * 4, (pid + 1) * 4
        gb = global_batch_from_local({"x": xs[lo:hi], "y": ys[lo:hi]}, mesh)
        params, opt_state, l = step(params, opt_state, gb)
        losses.append(float(l))
    json.dump({"pid": pid, "losses": losses,
               "w": np.asarray(params).ravel().tolist()}, open(out, "w"))
""")


def test_two_process_training_step(tmp_path):
    """A real data-parallel training loop across a 2-process jax.distributed
    cluster: per-host batch shards, mesh-sharded jit with implicit grad
    psum, replicated parameter updates identical on both hosts — the
    reference's DDP semantics (`train_net.py:246` create_ddp_model) in the
    SPMD model."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER % {"repo": REPO})
    outs = [tmp_path / f"t{p}.json" for p in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), str(port), str(outs[p])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    res = [json.load(open(o)) for o in outs]
    # both processes follow the identical replicated trajectory
    assert res[0]["losses"] == res[1]["losses"], res
    assert res[0]["w"] == res[1]["w"], res
    # and the loss decreases (the step actually trains on the GLOBAL batch)
    assert res[0]["losses"][-1] < res[0]["losses"][0], res
    # single-process oracle: same global batches must give the same weights
    import optax
    import jax
    import jax.numpy as jnp

    w = jnp.zeros((3, 1))
    tx = optax.sgd(0.1)
    st = tx.init(w)
    for it in range(3):
        xs = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10 + it
        ys = (xs @ np.asarray([[1.0], [2.0], [3.0]])) + 0.5

        def loss_fn(w):
            return jnp.mean((jnp.asarray(xs) @ w - jnp.asarray(ys)) ** 2)

        g = jax.grad(loss_fn)(w)
        up, st = tx.update(g, st, w)
        w = optax.apply_updates(w, up)
    np.testing.assert_allclose(
        np.asarray(w).ravel(), np.asarray(res[0]["w"]), rtol=1e-5,
        err_msg="2-process trajectory must equal the single-process oracle",
    )
