"""Microbenchmarks driving the MSDA design on real TPU hardware.

Measures (on whatever jax.devices()[0] is):
  1. gather row-rate vs row width (lanes) and table size
  2. gather row-rate vs batch (the b>1 anti-scaling mystery)
  3. scatter-add row-rate (for the custom VJP's grad_value)
  4. one-hot matmul rate for small tables (MXU alternative to gather)
  5. overlap: gather + matmul issued independently in one jit

Each timing runs the op `reps` times inside one jit'd lax.scan with a data
dependency per iteration so XLA cannot hoist or dedupe; every *call* gets a
fresh `jitter` operand so the remote-execution relay cannot cache identical
calls (the same trick bench.py uses). Numbers print to stderr; no JSON.

Usage: python scripts/bench_gather.py [case ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_CALL = [0]


def timed(fn, *args, iters=3):
    """fn(*args, jitter) with a fresh int32 jitter per call."""

    def call():
        _CALL[0] += 1
        # float() forces a device->host fetch of the result: on the axon
        # relay block_until_ready alone returns early for gather-dominated
        # programs (measured), so only fetched-value timings are trustworthy.
        return float(jnp.asarray(fn(*args, jnp.int32(_CALL[0]))).sum())

    call()  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return best


GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def make_gather_bench(n_rows, width, n_idx, dtype, reps=20):
    @jax.jit
    def run(table, idx, jitter):
        def step(carry, r):
            i = (idx + r + jitter) % n_rows
            g = jax.lax.gather(
                table, i.reshape(-1, 1), GATHER_DNUMS, slice_sizes=(1, width),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            return carry + g.sum(dtype=jnp.float32), None

        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(n_rows, width), dtype)
    idx = jnp.asarray(rng.randint(0, n_rows, size=n_idx), jnp.int32)
    return run, table, idx, reps


def case_width():
    log("\n=== gather rate vs row width (bf16 table, 64 MB, 2M rows gathered) ===")
    n_idx = 2_000_000
    for width in (32, 64, 128, 256, 512, 1024, 2048):
        n_rows = (64 * 1024 * 1024) // (width * 2)
        run, table, idx, reps = make_gather_bench(n_rows, width, n_idx, jnp.bfloat16)
        dt = timed(run, table, idx) / reps
        log(f"width={width:5d} lanes ({width*2:5d} B/row): {n_idx/dt/1e6:8.1f} rows/us "
            f"({n_idx*width*2/dt/1e9:7.1f} GB/s)  [{dt*1e3:.2f} ms]")


def case_table_size():
    log("\n=== gather rate vs table size (128-lane bf16 rows, 2M rows gathered) ===")
    n_idx = 2_000_000
    for mb in (1, 4, 16, 43, 86, 172, 344, 688):
        n_rows = mb * 1024 * 1024 // 256
        run, table, idx, reps = make_gather_bench(n_rows, 128, n_idx, jnp.bfloat16)
        dt = timed(run, table, idx) / reps
        log(f"table={mb:4d} MB: {n_idx/dt/1e6:8.1f} rows/us  [{dt*1e3:.2f} ms]")


def case_locality():
    log("\n=== gather rate vs index locality (128-lane bf16, 43MB table, 2M rows) ===")
    n_idx = 2_000_000
    n_rows = 43 * 1024 * 1024 // 256
    rng = np.random.RandomState(0)
    for name, idx_np in (
        ("random", rng.randint(0, n_rows, size=n_idx)),
        ("sorted", np.sort(rng.randint(0, n_rows, size=n_idx))),
        ("sequential", np.arange(n_idx) % n_rows),
        ("same-row", np.zeros(n_idx, np.int64)),
    ):
        run, table, idx, reps = make_gather_bench(n_rows, 128, n_idx, jnp.bfloat16)
        idx = jnp.asarray(idx_np, jnp.int32)
        dt = timed(run, table, idx) / reps
        log(f"{name:>10}: {n_idx/dt/1e6:8.1f} rows/us  [{dt*1e3:.2f} ms]")


def case_scatter():
    log("\n=== scatter-add rate (grad_value path): 2M 128-lane rows into 43MB ===")
    n_idx = 2_000_000
    n_rows = 43 * 1024 * 1024 // 256
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    reps = 6

    for dtype in (jnp.bfloat16, jnp.float32):
        @jax.jit
        def run(upd, idx, jitter):
            def step(carry, r):
                i = (idx + r + jitter) % n_rows
                z = jnp.zeros((n_rows, 128), dtype)
                z = jax.lax.scatter_add(
                    z, i.reshape(-1, 1), upd, dnums,
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
                return carry + z[0].sum(dtype=jnp.float32), None

            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return out

        rng = np.random.RandomState(0)
        upd = jnp.asarray(rng.randn(n_idx, 128), dtype)
        idx = jnp.asarray(rng.randint(0, n_rows, size=n_idx), jnp.int32)
        dt = timed(run, upd, idx) / reps
        log(f"scatter-add {jnp.dtype(dtype).name}: {n_idx/dt/1e6:8.1f} rows/us  [{dt*1e3:.2f} ms]")


def case_onehot_mxu():
    log("\n=== one-hot MXU matmul vs gather for small tables ===")
    n_samples = 646_144  # Q*H*P at encoder scale for one level
    reps = 6
    for s_l, d in ((256, 32), (1024, 32), (3840, 32), (256, 128), (1024, 128)):
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.randn(s_l, d), jnp.bfloat16)
        idx4 = jnp.asarray(rng.randint(0, s_l, size=(n_samples, 4)), jnp.int32)
        w4 = jnp.asarray(rng.rand(n_samples, 4), jnp.bfloat16)

        @jax.jit
        def run(table, idx4, w4, jitter):
            iota = jax.lax.iota(jnp.int32, s_l)

            def step(carry, r):
                i4 = (idx4 + r + jitter) % s_l
                a = jnp.zeros((n_samples, s_l), jnp.bfloat16)
                for c in range(4):
                    a = a + w4[:, c:c + 1] * (i4[:, c:c + 1] == iota[None, :]).astype(jnp.bfloat16)
                o = jnp.dot(a, table, preferred_element_type=jnp.float32)
                return carry + o.sum(dtype=jnp.float32), None

            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return out

        try:
            dt = timed(run, table, idx4, w4) / reps
            log(f"s_l={s_l:5d} d={d:4d}: {n_samples/dt/1e6:8.1f} samples/us  [{dt*1e3:.2f} ms] "
                f"(gather of same samples @170 rows/us would be {n_samples/170e6*1e3:.2f} ms)")
        except Exception as e:
            log(f"s_l={s_l:5d} d={d:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")


def case_overlap():
    log("\n=== overlap: independent gather + big matmul in one jit ===")
    n_idx = 2_000_000
    n_rows = 43 * 1024 * 1024 // 256
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(n_rows, 128), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, n_rows, size=n_idx), jnp.int32)
    m = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    reps = 10

    @jax.jit
    def gather_only(table, idx, jitter):
        def step(carry, r):
            g = jax.lax.gather(table, ((idx + r + jitter) % n_rows).reshape(-1, 1),
                               GATHER_DNUMS, slice_sizes=(1, 128),
                               mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            return carry + g.sum(dtype=jnp.float32), None

        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out

    @jax.jit
    def mm_only(m, jitter):
        def step(carry, r):
            return jnp.dot(carry + jitter.astype(jnp.bfloat16) * 0, m,
                           preferred_element_type=jnp.bfloat16), None

        out, _ = jax.lax.scan(step, m, jnp.arange(reps))
        return out.sum(dtype=jnp.float32)

    @jax.jit
    def both(table, idx, m, jitter):
        def step(carry, r):
            cg, cm = carry
            g = jax.lax.gather(table, ((idx + r + jitter) % n_rows).reshape(-1, 1),
                               GATHER_DNUMS, slice_sizes=(1, 128),
                               mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            return (cg + g.sum(dtype=jnp.float32),
                    jnp.dot(cm, m, preferred_element_type=jnp.bfloat16)), None

        (og, om), _ = jax.lax.scan(step, (jnp.zeros((), jnp.float32), m), jnp.arange(reps))
        return og + om.sum(dtype=jnp.float32)

    tg = timed(gather_only, table, idx) / reps
    tm = timed(mm_only, m) / reps
    tb = timed(both, table, idx, m) / reps
    log(f"gather alone: {tg*1e3:.2f} ms | matmul alone: {tm*1e3:.2f} ms | "
        f"both per step: {tb*1e3:.2f} ms (serial sum would be {(tg+tm)*1e3:.2f})")


def case_batch():
    log("\n=== the b>1 anti-scaling probe: one big gather vs scan-over-b ===")
    n_idx_per = 2_580_000
    n_rows_per = 43 * 1024 * 1024 // 256
    rng = np.random.RandomState(0)
    reps = 6
    for b in (1, 2, 4):
        table = jnp.asarray(rng.randn(b * n_rows_per, 128), jnp.bfloat16)
        idx = jnp.asarray(
            rng.randint(0, n_rows_per, size=(b, n_idx_per))
            + (np.arange(b)[:, None] * n_rows_per),
            jnp.int32,
        )

        @jax.jit
        def one_big(table, idx, jitter):
            def step(carry, r):
                i = (idx.reshape(-1) + r + jitter) % (b * n_rows_per)
                g = jax.lax.gather(table, i.reshape(-1, 1),
                                   GATHER_DNUMS, slice_sizes=(1, 128),
                                   mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                return carry + g.sum(dtype=jnp.float32), None

            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return out

        @jax.jit
        def scan_b(table, idx, jitter):
            tb = table.reshape(b, n_rows_per, 128)
            ib = idx - (jnp.arange(b)[:, None] * n_rows_per)

            def step(carry, r):
                def per_img(c, ti):
                    t, i = ti
                    g = jax.lax.gather(t, ((i + r + jitter) % n_rows_per).reshape(-1, 1),
                                       GATHER_DNUMS, slice_sizes=(1, 128),
                                       mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                    return c + g.sum(dtype=jnp.float32), None

                o, _ = jax.lax.scan(per_img, carry, (tb, ib))
                return o, None

            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return out

        t1 = timed(one_big, table, idx) / reps
        t2 = timed(scan_b, table, idx) / reps
        n_total = b * n_idx_per
        log(f"b={b}: one-gather {n_total/t1/1e6:7.1f} rows/us [{t1*1e3:.1f} ms] | "
            f"scan-over-b {n_total/t2/1e6:7.1f} rows/us [{t2*1e3:.1f} ms]")


CASES = {
    "width": case_width,
    "table": case_table_size,
    "locality": case_locality,
    "scatter": case_scatter,
    "onehot": case_onehot_mxu,
    "overlap": case_overlap,
    "batch": case_batch,
}


def case_scatter2():
    log("\n=== scatter-add variants (2.58M 128-lane f32 rows into 85MB) ===")
    n_idx = 2_580_000
    n_rows = 165_392
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    rng = np.random.RandomState(0)
    upd = jnp.asarray(rng.randn(n_idx, 128), jnp.float32)
    idx_rand = jnp.asarray(rng.randint(0, n_rows, size=n_idx), jnp.int32)
    idx_sort = jnp.asarray(np.sort(rng.randint(0, n_rows, size=n_idx)), jnp.int32)
    # near-raster: encoder-like (each query hits cells near its own pixel)
    base = np.repeat(np.arange(0, n_rows - 64, (n_rows - 64) / (n_idx // 16)), 16)[:n_idx]
    idx_raster = jnp.asarray(base.astype(np.int64) + rng.randint(0, 64, size=n_idx), jnp.int32)
    reps = 4

    def mk(sorted_flag=False, unique=False):
        @jax.jit
        def run(upd, idx, jitter):
            def step(carry, r):
                # +r+jitter then clip: varies per step/call (defeats CSE and
                # relay caching) while PRESERVING sortedness for the flag
                i = jnp.minimum(idx + r + jitter, n_rows - 1)
                z = jnp.zeros((n_rows, 128), jnp.float32)
                z = jax.lax.scatter_add(
                    z, i.reshape(-1, 1), upd,
                    dnums, indices_are_sorted=sorted_flag, unique_indices=unique,
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
                return carry + z[0].sum(dtype=jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return out
        return run

    for name, idx, fl in (("random", idx_rand, False), ("sorted", idx_sort, False),
                          ("sorted+flag", idx_sort, True), ("near-raster", idx_raster, False)):
        dt = timed(mk(sorted_flag=fl), upd, idx) / reps
        log(f"{name:>12}: {n_idx/dt/1e6:7.1f} rows/us  [{dt*1e3:.1f} ms]")

    # 4-way split into 4 tables, summed after (tests scatter concurrency)
    @jax.jit
    def split4(upd, idx, jitter):
        def step(carry, r):
            zs = []
            for s in range(4):
                z = jnp.zeros((n_rows, 128), jnp.float32)
                z = jax.lax.scatter_add(
                    z, jnp.minimum(idx[s::4] + r + jitter, n_rows - 1).reshape(-1, 1),
                    upd[s::4],
                    dnums, mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                zs.append(z)
            z = zs[0] + zs[1] + zs[2] + zs[3]
            return carry + z[0].sum(dtype=jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out
    dt = timed(split4, upd, idx_rand) / reps
    log(f"{'4-way split':>12}: {n_idx/dt/1e6:7.1f} rows/us  [{dt*1e3:.1f} ms]")

    # sort+segment_sum alternative
    @jax.jit
    def seg(upd, idx, jitter):
        def step(carry, r):
            si, su = jax.lax.sort_key_val(
                jnp.broadcast_to((jnp.minimum(idx + r + jitter, n_rows - 1))[:, None],
                                 upd.shape), upd)
            z = jax.ops.segment_sum(su, si[:, 0], num_segments=n_rows)
            return carry + z[0].sum(dtype=jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out
    try:
        dt = timed(seg, upd, idx_rand) / reps
        log(f"{'sort+segsum':>12}: {n_idx/dt/1e6:7.1f} rows/us  [{dt*1e3:.1f} ms]")
    except Exception as e:
        log(f"sort+segsum FAILED: {type(e).__name__}: {str(e)[:100]}")


CASES["scatter2"] = case_scatter2


if __name__ == "__main__":
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])
    names = sys.argv[1:] or list(CASES)
    for n in names:
        CASES[n]()
