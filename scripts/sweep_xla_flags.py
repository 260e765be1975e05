"""Sweep XLA/libtpu compiler flags over a bench.py workload.

The round-3 lane-cap accounting (BASELINE.md) shows UNet++'s remaining
0.79x -> 1.0x gap lives inside XLA's conv fusions — raw scheduling
efficiency that JAX-level code cannot direct. Compiler flags are the one
untried lever: this driver re-runs ``bench.py --model <m>`` in a fresh
subprocess per flag set (flags are read once at backend init) and
reports host-side patches/sec plus the median step time.

Flags that the local XLA client does not recognize abort the subprocess
("Unknown flags in XLA_FLAGS"); those rows are reported as rejected so
the sweep doubles as a supported-flag probe for this libtpu build.

Usage:
    python scripts/sweep_xla_flags.py --model unetpp_r34 [--steps 24]
    python scripts/sweep_xla_flags.py --flags "--xla_tpu_scoped_vmem_limit_kib=65536"
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

# Candidate sets: scoped-VMEM budget (bigger fusions), fusion cost model
# toggles, and reduce/broadcast fusion behavior around the BN-stat
# epilogues that dominate the UNet++ profile (convert_reduce_fusion 41%).
CANDIDATES: list[list[str]] = [
    [],  # baseline
    ["--xla_tpu_scoped_vmem_limit_kib=32768"],
    ["--xla_tpu_scoped_vmem_limit_kib=65536"],
    ["--xla_tpu_scoped_vmem_limit_kib=98304"],
    ["--xla_tpu_enable_experimental_fusion_cost_model=true"],
    ["--xla_tpu_rwb_fusion=false"],
    ["--xla_tpu_enable_dot_strength_reduction=false"],
    ["--xla_tpu_licm_size_inflation_ratio=4"],
    ["--xla_tpu_order_dot_after_layout=false"],
    ["--xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true"],
    ["--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"],
    ["--xla_tpu_async_copy_bandwidth_scaling_factor=1.5"],
]


def run_one(
    flags: list[str], model: str, steps: int, batch: int | None, var: str
) -> dict:
    env = dict(os.environ)
    if flags:
        env[var] = (env.get(var, "") + " " + " ".join(flags)).strip()
    cmd = [sys.executable, "bench.py", "--model", model, "--steps", str(steps)]
    if batch:
        cmd += ["--batch", str(batch)]
    proc = subprocess.run(
        cmd, cwd=_REPO, env=env, capture_output=True, text=True, timeout=900
    )
    row: dict = {"flags": " ".join(flags) or "(baseline)"}
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
        row["error"] = tail[0][:200] if tail else f"rc={proc.returncode}"
        return row
    try:
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        row.update(out["models"][model])
    except Exception as exc:  # noqa: BLE001
        row["error"] = f"parse: {exc}"
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unetpp_r34")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--flags", default=None, help="run a single flag set instead")
    p.add_argument(
        "--var",
        default="LIBTPU_INIT_ARGS",
        help="env var carrying the flags; the local XLA client rejects "
        "--xla_tpu_* in XLA_FLAGS (unknown-flag fatal), but libtpu reads "
        "its own flags from LIBTPU_INIT_ARGS",
    )
    args = p.parse_args()

    sets = [args.flags.split()] if args.flags else CANDIDATES
    results = []
    for flags in sets:
        row = run_one(flags, args.model, args.steps, args.batch, args.var)
        results.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in results if "patches_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["patches_per_sec"])
        print(f"\nbest: {best['flags']} -> {best['patches_per_sec']} p/s")


if __name__ == "__main__":
    main()
