"""Round-4 A/B protocol driver (VERDICT r3 items 1-4).

Runs the env-gated MSDA/LN experiments as fresh-process bracketed A/Bs on
the TPU (BASELINE.md measurement caveats: value-fetch timing, warm call,
ref-exp-ref bracketing, nothing else on the host), parses each leg's JSON
line, and appends an incremental log to --out (default /tmp/ab_r4.jsonl)
plus a final markdown table on stdout.

Resumable: legs already present in the output file are skipped, so a relay
crash mid-queue only costs the in-flight leg. Run with --phases to select
a subset, e.g. `python scripts/ab_r4.py --phases infer,train`.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measurement-protocol version stamped into every record (ADVICE r4): all
# records in /tmp/ab_r4.jsonl written on/after 2026-08-19 (the r4 relay
# recovery) use the min-of-n per-call value-fetch protocol ("percall_v2");
# resume treats protocol-mismatched legs as not-done.
PROTOCOL = "percall_v2"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# name -> (argv, env overrides). Bracketing refs are interleaved so every
# experiment sits within ~2 legs of a reference measurement.
PHASES = {
    "infer": [
        ("ref_a", ["scripts/bench_infer.py", "--batch", "1", "--iters", "10"], {}),
        ("conv_table", ..., {"ZGDINO_MSDA_CONV_TABLE": "1"}),
        ("per_chain", ..., {"ZGDINO_MSDA_PER_CHAIN_COORDS": "1"}),
        ("ref_b", ..., {}),
        ("conv+chain", ..., {"ZGDINO_MSDA_CONV_TABLE": "1",
                             "ZGDINO_MSDA_PER_CHAIN_COORDS": "1"}),
        ("ln_fast", ..., {"ZGDINO_LN_FAST": "1"}),
        ("ref_c", ..., {}),
        ("conv+chain+ln", ..., {"ZGDINO_MSDA_CONV_TABLE": "1",
                                "ZGDINO_MSDA_PER_CHAIN_COORDS": "1",
                                "ZGDINO_LN_FAST": "1"}),
        ("split_levels", ..., {"ZGDINO_MSDA_SPLIT_LEVELS": "1"}),
        ("ref_d", ..., {}),
        ("flat_gather", ..., {"ZGDINO_MSDA_FLAT_GATHER": "1",
                              "ZGDINO_MSDA_PER_CHAIN_COORDS": "1"}),
        ("swin_bf16_sm", ..., {"ZGDINO_SWIN_BF16_SOFTMAX": "1"}),
        ("ref_e", ..., {}),
        # decoder MSDA (115k rows < the 1<<20 small-path threshold) runs as
        # one whole-table gather at ~108 rows/us in the r3 trace; route it
        # through the per-(b,h) chains instead
        ("dec_small", ..., {"ZGDINO_MSDA_SMALL_MIN": "65536"}),
        ("ref_f", ..., {}),
    ],
    "lane": [
        ("lane_gather", ["scripts/bench_gather_lane.py"], {}),
    ],
    "train": [
        ("t_ref_a", ["scripts/bench_train.py", "--batch", "1", "--no-remat",
                     "--iters", "5"], {}),
        ("t_norows", ..., {"ZGDINO_MSDA_SAVE_ROWS": "0"}),
        ("t_bwd_chain", ..., {"ZGDINO_MSDA_BWD_PER_CHAIN_COORDS": "1"}),
        ("t_ref_b", ..., {}),
        ("t_per_level", ..., {"ZGDINO_MSDA_PER_LEVEL_SCATTER": "1"}),
        ("t_allfwd", ..., {"ZGDINO_MSDA_CONV_TABLE": "1",
                           "ZGDINO_MSDA_PER_CHAIN_COORDS": "1",
                           "ZGDINO_MSDA_BWD_PER_CHAIN_COORDS": "1",
                           "ZGDINO_LN_FAST": "1"}),
        ("t_ref_c", ..., {}),
    ],
    "batch": [
        ("b8_ref", ["scripts/bench_infer.py", "--batch", "8", "--iters", "6"], {}),
        ("b8_conv", ..., {"ZGDINO_MSDA_CONV_TABLE": "1"}),
        ("b8_hg1", ..., {"ZGDINO_MSDA_IMG_HEAD_GROUP": "1"}),
        ("b8_hg2", ..., {"ZGDINO_MSDA_IMG_HEAD_GROUP": "2"}),
        ("b8_unroll", ..., {"ZGDINO_MSDA_IMG_UNROLL": "1"}),
        ("b8_unroll_hg2", ..., {"ZGDINO_MSDA_IMG_UNROLL": "1",
                                "ZGDINO_MSDA_IMG_HEAD_GROUP": "2"}),
        ("b4_ref", ["scripts/bench_infer.py", "--batch", "4", "--iters", "6"], {}),
        ("b2_ref", ["scripts/bench_infer.py", "--batch", "2", "--iters", "8"], {}),
    ],
    # LAST: per-(b,h) chains beyond B=2 crashed the relay worker in r2
    # (64-iteration scan at b=8). b=4 (32 chains) is the cautious probe.
    "hazard": [
        ("b4_bh", ["scripts/bench_infer.py", "--batch", "4", "--iters", "6"],
         {"ZGDINO_MSDA_BH_MAX_B": "4"}),
    ],
}

# Wall-clock-trimmed queue for a cold compile cache (~60-370 s per fresh
# HLO): lead with the COMBINED candidate (if it wins, all three gates flip
# together and per-gate attribution is secondary), then the two independent
# single-gate candidates with the largest trace-mined upside, then batch
# monotonicity data. Leg names match PHASES so a partial full-queue log
# resumes into this one.
PHASES["quick"] = [
    ("ref_a", ["scripts/bench_infer.py", "--batch", "1", "--iters", "10"], {}),
    ("conv+chain+ln", ..., {"ZGDINO_MSDA_CONV_TABLE": "1",
                            "ZGDINO_MSDA_PER_CHAIN_COORDS": "1",
                            "ZGDINO_LN_FAST": "1"}),
    ("dec_small", ..., {"ZGDINO_MSDA_SMALL_MIN": "65536"}),
    ("ref_b", ..., {}),
    ("swin_bf16_sm", ..., {"ZGDINO_SWIN_BF16_SOFTMAX": "1"}),
    ("conv_table", ..., {"ZGDINO_MSDA_CONV_TABLE": "1"}),
    ("ref_c", ..., {}),
]
# Single-gate attribution after the combined leg lost (+17.5% vs ref_a):
# the three gates target disjoint trace families, so one may still win
# while another masks it.
PHASES["quick2"] = [
    ("per_chain", ["scripts/bench_infer.py", "--batch", "1", "--iters", "10"],
     {"ZGDINO_MSDA_PER_CHAIN_COORDS": "1"}),
    ("ln_fast", ..., {"ZGDINO_LN_FAST": "1"}),
    ("ref_g", ..., {}),
]
PHASES["quickbatch"] = [
    ("b8_ref", ["scripts/bench_infer.py", "--batch", "8", "--iters", "6"], {}),
    ("b8_conv", ..., {"ZGDINO_MSDA_CONV_TABLE": "1"}),
    ("b4_ref", ["scripts/bench_infer.py", "--batch", "4", "--iters", "6"], {}),
    ("b2_ref", ["scripts/bench_infer.py", "--batch", "2", "--iters", "8"], {}),
]
# dec_small decision rerun (VERDICT r4 weak#6): the r4 reading (95.3 vs
# bracket refs 98.9/95.3) was inside bracketing noise. 30 iters per leg,
# ref-exp-ref, to beat the noise or drop the gate.
PHASES["decide"] = [
    ("ref_i30", ["scripts/bench_infer.py", "--batch", "1", "--iters", "30"], {}),
    ("dec_small_i30", ..., {"ZGDINO_MSDA_SMALL_MIN": "65536"}),
    ("ref_j30", ..., {}),
]
# r5 threshold-boundary legs (run BEFORE the gate deletion): conv-table won
# at b=8 (629.9 vs 668.3) and lost at b=1 (+9.4), so the builder becomes
# batch-dependent — these decide the B threshold; dec_small won at b=1
# (92.9 vs 99.2/99.4 min-of-30), b2_dec checks it composes at b=2.
PHASES["thresh"] = [
    ("b4_conv", ["scripts/bench_infer.py", "--batch", "4", "--iters", "6"],
     {"ZGDINO_MSDA_CONV_TABLE": "1"}),
    ("b2_conv", ["scripts/bench_infer.py", "--batch", "2", "--iters", "8"],
     {"ZGDINO_MSDA_CONV_TABLE": "1"}),
    ("b2_dec", ["scripts/bench_infer.py", "--batch", "2", "--iters", "8"],
     {"ZGDINO_MSDA_SMALL_MIN": "65536"}),
]
# b=1 builder decision at 30 iters: conv won at b=2/4/8 (-3.9/-13.9/-38 ms)
# but read +9.4 at b=1 over 10 iters — confirm the sign before freezing the
# batch-dependent builder threshold at B>=2. Composed with the landed
# dec_small routing so the comparison is between the two candidate b=1
# defaults.
PHASES["decide2"] = [
    ("b1_convdec_i30", ["scripts/bench_infer.py", "--batch", "1", "--iters", "30"],
     {"ZGDINO_MSDA_CONV_TABLE": "1", "ZGDINO_MSDA_SMALL_MIN": "65536"}),
    ("b1_dec_k30", ..., {"ZGDINO_MSDA_SMALL_MIN": "65536"}),
]
PHASES["quicktrain"] = [
    ("t_ref_a", ["scripts/bench_train.py", "--batch", "1", "--no-remat",
                 "--iters", "5"], {}),
    ("t_allfwd", ..., {"ZGDINO_MSDA_CONV_TABLE": "1",
                       "ZGDINO_MSDA_PER_CHAIN_COORDS": "1",
                       "ZGDINO_MSDA_BWD_PER_CHAIN_COORDS": "1",
                       "ZGDINO_LN_FAST": "1"}),
]


def _fill(legs):
    """'...' argv means: inherit the most recent explicit argv above."""
    out, last = [], None
    for name, argv, env in legs:
        if argv is ...:
            argv = last
        last = argv
        out.append((name, argv, env))
    return out


def run_leg(name, argv, env, timeout):
    e = dict(os.environ, **env)
    log(f"--- {name} env={env}")
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable] + argv, cwd=REPO, env=e,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"leg": name, "error": f"timeout {timeout}s", "env": env}
    rec = {"leg": name, "env": env, "protocol": PROTOCOL, "rc": p.returncode,
           "wall_s": round(time.time() - t0, 1)}
    parsed = None
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    if parsed:
        rec.update(parsed)
    else:
        rec["error"] = (p.stderr or p.stdout)[-800:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="infer,lane,train,batch,hazard")
    ap.add_argument("--out", default="/tmp/ab_r4.jsonl")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    # Records without a protocol tag predate the tagging but
                    # were all measured under percall_v2 (see PROTOCOL note);
                    # any other explicit protocol is treated as not-done.
                    if "error" not in r and r.get("protocol", PROTOCOL) == PROTOCOL:
                        done.add(r["leg"])
                except json.JSONDecodeError:
                    pass

    results = []
    for phase in args.phases.split(","):
        for name, argv, env in _fill(PHASES[phase]):
            if name in done:
                log(f"skip {name} (already in {args.out})")
                continue
            rec = run_leg(name, argv, env, args.timeout)
            results.append(rec)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if "error" in rec:
                log(f"!!! {name} FAILED: {rec['error'][:300]}")
                log("continuing with next leg after 60s cooldown...")
                time.sleep(60)

    # markdown summary of everything in the log file
    rows = []
    with open(args.out) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    print("\n| leg | ms/batch | img/s | ms/step | note |")
    print("|---|---|---|---|---|")
    for r in rows:
        note = r.get("error", "") or " ".join(
            f"{k}={v}" for k, v in r.items()
            if k in ("plain_ms", "lane_ms", "bracket_ms"))
        print(f"| {r['leg']} | {r.get('ms_per_batch', '')} "
              f"| {r.get('img_per_sec', '')} | {r.get('train_step_ms', '')} "
              f"| {note[:60]} |")


if __name__ == "__main__":
    main()
