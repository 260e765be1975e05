#!/usr/bin/env python
"""Disjoint-bucket accounting of a train step (VERDICT r4 #1).

The round-4 floor argument summed a conv lane-cap (~128 ms) with a
BN-reduce family (75-94 ms) whose fusions were DESCRIBED as "conv +
BatchNorm-stats epilogue fusions" — leaving open whether the two floors
counted the same measured ops twice. This tool removes the ambiguity:
every op of the profiled step is assigned to EXACTLY ONE bucket, decided
from the compiled HLO module's own fused computations:

  conv+stats_fusion — fusions whose computation contains a convolution
                      AND a reduce (the overlap, made explicit)
  conv_fusion       — fusions containing a convolution only
  conv_standalone   — top-level convolution instructions
  reduce_fusion     — fusions containing reduce but no convolution
  copy              — copy/transpose/reshape/bitcast data movement
  elementwise_fusion / other — the rest

Floors:
  conv buckets  — per contained convolution, flops / (min(Cout,128)/128
                  x 197 TF/s): the 128-lane MXU ceiling, attributed to
                  the op that actually executed (augmentation branches
                  that never ran are excluded automatically because the
                  floor is summed over PROFILED ops)
  reduce_fusion — unique input bytes / 819 GB/s HBM (a floor for the ops
                  AS SCHEDULED; a fused conv+stats kernel can eliminate
                  them — that lever is measured by
                  scripts/bench_pallas_column.py)
  copy          — 0 (eliminable in principle)

Round-5 result on unetpp_r34 bs32 512^2 (217.2 ms step): conv-containing
ops measure 177.4 ms against a 128.4 ms disjoint lane-cap floor (72%
efficiency); the non-conv tail is 39.8 ms with ~4.4 ms of HBM floors.
Disjoint floors sum to ~133 ms < 177.8 ms, so 180 p/s is NOT proven
impossible — it requires ~92% lane-cap conv efficiency plus a ~3x
smaller tail; see BASELINE.md "Disjoint accounting (round 5)".

Usage: python scripts/bucket_accounting.py [--model unetpp_r34]
         [--steps 6] [--trace-dir DIR] [--hlo-file F.txt]
"""

from __future__ import annotations

import argparse
import collections
import importlib.util
import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

_spec = importlib.util.spec_from_file_location(
    "profile_step", _REPO / "scripts" / "profile_step.py"
)
profile_step = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(profile_step)

PEAK_BF16 = 197e12
HBM_BW = 819e9  # v5e HBM bytes/s

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1,
}
_COMP_RE = re.compile(r"^(ENTRY\s+)?%([\w.\-]+)\s*\(")
_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=")
# first lowercase token followed by '(' after the '=' is the opcode;
# type strings only contain uppercase parens (T(8,128), S(1))
_TYPE_OP_RE = re.compile(r"=\s*(.*?)\s([a-z][a-z0-9\-]*)\(")
_CALL_RE = re.compile(r"calls=%([\w.\-]+)")

COPY_OPS = {
    "copy", "transpose", "bitcast", "bitcast-convert", "reshape",
    "copy-start", "copy-done",
}


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo(text: str):
    """(ops, comps, sym): instruction table, per-computation flags, and
    per-computation symbol tables (instruction name -> result type)."""
    comps: dict[str, dict] = {}
    ops: dict[str, tuple] = {}
    sym: dict[str, dict] = collections.defaultdict(dict)
    cur = None
    for line in text.splitlines():
        if not line.startswith(" "):  # computation headers sit at col 0
            m = _COMP_RE.match(line)
            if m:
                cur = m.group(2)
                comps[cur] = {"convs": [], "reduce": False, "param_bytes": 0}
            continue
        mn = _NAME_RE.match(line)
        if not mn:
            continue
        name = mn.group(1)
        mt = _TYPE_OP_RE.search(line.split(", metadata=")[0])
        type_str, opcode = (mt.group(1), mt.group(2)) if mt else ("", "?")
        if cur:
            sym[cur][name] = type_str
            c = comps[cur]
            if opcode == "convolution":
                c["convs"].append(line)
            elif opcode in ("reduce", "reduce-window"):
                c["reduce"] = True
            elif opcode == "parameter":
                c["param_bytes"] += _shape_bytes(type_str)
        called = None
        if opcode == "fusion":
            mc = _CALL_RE.search(line)
            called = mc.group(1) if mc else None
        ops[name] = (opcode, called, line, type_str)
    return ops, comps, sym


def conv_flops_and_cap(line: str, table: dict) -> tuple[float, float]:
    """(flops, lane-cap seconds) for one convolution instruction; operand
    shapes are resolved through the surrounding computation's symbols."""
    _, rest = line.split(" = ", 1)
    mt = _TYPE_OP_RE.search("= " + rest.split(", metadata=")[0])
    if not mt:
        return 0.0, 0.0
    m = _SHAPE.search(mt.group(1))
    if not m:
        return 0.0, 0.0
    out_dims = [int(d) for d in m.group(2).split(",") if d]
    args = rest.split("convolution(", 1)[1].split(")", 1)[0]
    opnames = [a.strip().lstrip("%") for a in args.split(",")]
    mr = _SHAPE.search(table.get(opnames[1], "")) if len(opnames) > 1 else None
    rhs_dims = [int(d) for d in mr.group(2).split(",") if d] if mr else []
    mw = re.search(r"window=\{size=(\d+)x?(\d*)", rest)
    kh = int(mw.group(1)) if mw else 1
    kw = int(mw.group(2)) if (mw and mw.group(2)) else 1
    md = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", rest)
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    if md and rhs_dims:
        cin = rhs_dims[md.group(2).index("i")]
        cout = out_dims[md.group(3).index("f")]
    elif rhs_dims:
        cin, cout = rhs_dims[-2], out_dims[-1]
    else:
        return 0.0, 0.0
    flops = 2.0 * out_elems * cin * kh * kw
    cap = flops / (min(cout, 128) / 128.0 * PEAK_BF16)
    return flops, cap


def profiled_times(trace_dir: str, steps: int) -> dict[str, float]:
    import glob
    import gzip
    import os

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    times: dict[str, float] = collections.defaultdict(float)
    for path in paths:
        raw = open(path, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        planes = profile_step.parse_xspace(raw)
        for plane in planes:
            if "TPU" not in plane["name"] and not plane["name"].startswith(
                "/device"
            ):
                continue
            for line in plane["lines"]:
                lname = line.get("display_name") or line["name"]
                if lname != "XLA Ops":
                    continue
                for ev in line["events"]:
                    name = plane["event_meta"].get(ev["meta"], {}).get(
                        "name", str(ev["meta"])
                    )
                    # profiler event names carry the full instruction
                    # text; the op name is the lhs
                    name = name.lstrip("%").split(" = ")[0].strip()
                    times[name] += ev["dur_ps"] / 1e9 / steps
    return dict(times)


def analyze(times: dict, hlo_text: str) -> None:
    ops, comps, sym = parse_hlo(hlo_text)
    entry_types = {n: t for n, (_, _, _, t) in ops.items()}
    buckets = collections.defaultdict(lambda: [0.0, 0, 0.0])  # ms, n, floor
    conv_flops = 0.0
    reduce_bytes = 0
    unmatched = 0.0
    for name, ms in times.items():
        opcode, called, line, _ = ops.get(name, ("?", None, "", ""))
        floor = 0.0
        if opcode == "convolution":
            bk = "conv_standalone"
            fl, cap = conv_flops_and_cap(line, entry_types)
            floor = cap * 1e3
            conv_flops += fl
        elif opcode == "fusion" and called and comps.get(called, {}).get("convs"):
            bk = (
                "conv+stats_fusion"
                if comps[called]["reduce"]
                else "conv_fusion"
            )
            for cl in comps[called]["convs"]:
                fl, cap = conv_flops_and_cap(cl, sym[called])
                floor += cap * 1e3
                conv_flops += fl
        elif opcode == "fusion" and called and comps.get(called, {}).get("reduce"):
            bk = "reduce_fusion"
            reduce_bytes += comps[called]["param_bytes"]
        elif opcode in COPY_OPS:
            bk = "copy"
        elif opcode == "fusion":
            bk = "elementwise_fusion"
        elif opcode == "?":
            bk = "unmatched"
            unmatched += ms
        else:
            bk = "other"
        b = buckets[bk]
        b[0] += ms
        b[1] += 1
        b[2] += floor

    total = sum(v[0] for v in buckets.values())
    floor_total = sum(v[2] for v in buckets.values())
    reduce_floor_ms = reduce_bytes / HBM_BW * 1e3
    print(f"\n{'bucket':<22}{'ms/step':>10}{'ops':>7}{'lane-cap floor':>17}")
    for bk, (ms, n, fl) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        extra = f"{fl:13.1f} ms" if fl else " " * 16
        if bk == "reduce_fusion":
            extra = f"  HBM {reduce_floor_ms:.1f} ms ({reduce_bytes / 1e9:.2f} GB)"
        if bk == "copy":
            extra = "  floor 0 (eliminable)"
        print(f"{bk:<22}{ms:>10.2f}{n:>7}{extra}")
    print(f"{'TOTAL':<22}{total:>10.2f}")
    conv_ms = sum(
        buckets[k][0]
        for k in ("conv_standalone", "conv_fusion", "conv+stats_fusion")
    )
    print(
        f"\nconv-containing ops: {conv_ms:.2f} ms measured vs "
        f"{floor_total:.1f} ms disjoint lane-cap floor "
        f"({conv_flops / 1e12:.2f} TFLOP -> {100 * floor_total / conv_ms:.0f}% "
        "efficiency)"
    )
    print(
        f"disjoint floors total: {floor_total + reduce_floor_ms:.1f} ms "
        f"(conv {floor_total:.1f} + reduce-as-scheduled {reduce_floor_ms:.1f}); "
        "180 p/s needs <= 177.8 ms/step"
    )
    if unmatched > 0.01:
        print(f"unmatched profiled time: {unmatched:.2f} ms")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unetpp_r34")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--hlo-file", default=None,
                   help="reuse a saved compiled-HLO text dump")
    args = p.parse_args()

    if args.hlo_file:
        hlo_text = Path(args.hlo_file).read_text()
    else:
        import jax

        import bench

        b = args.batch or bench.DEFAULT_BATCH.get(args.model, 8)
        step, state, batch_data = bench.build(args.model, b, args.image_size)
        compiled = step.lower(state, jax.device_put(batch_data)).compile()
        hlo_text = compiled.as_text()

    trace_dir = args.trace_dir or profile_step.capture(
        args.model, args.batch, args.steps, args.image_size
    )
    times = profiled_times(trace_dir, args.steps)
    print(f"trace: {trace_dir}   profiled ops: {len(times)}")
    analyze(times, hlo_text)


if __name__ == "__main__":
    main()
