#!/usr/bin/env python
"""Disjoint-bucket accounting of the UNet++ train step (VERDICT r4 #1).

The round-4 floor argument summed a conv lane-cap (~128 ms) with a
BN-reduce family (75-94 ms) whose fusions were DESCRIBED as "conv +
BatchNorm-stats epilogue fusions" — leaving open whether the two buckets
overlap (the same measured op counted against both floors). This tool
removes the ambiguity: it assigns EVERY op of the profiled step to
EXACTLY ONE bucket, determined from the compiled HLO module itself:

  conv      — convolution instructions, and fusions whose called
              computation CONTAINS a convolution (if any exist, they are
              reported separately so the overlap is visible, not hidden)
  reduce    — fusions/instructions containing reduce but NO convolution
              (the BN-statistics family)
  copy      — copy/transpose/bitcast-convert data movement
  elementwise — everything else (bias adds, ReLU, optimizer math, ...)

and prints measured ms/step per bucket next to a physics floor:

  conv floor   = sum over conv instrs of flops / (min(Cout,128)/128 x
                 197 TF/s) — the 128-lane MXU ceiling
  reduce floor = unique input bytes / 819 GB/s HBM — a floor FOR THE OPS
                 AS SCHEDULED; note this is NOT a step floor, because a
                 fused conv+stats kernel could eliminate these reads
                 entirely (that lever is measured separately by
                 scripts/bench_pallas_column.py)
  copy floor   = 0 (eliminable in principle)

Method: op->time from a jax.profiler trace (profile_step.py parser);
op->bucket and shapes from the SAME executable's optimized HLO text
(bench.build + AOT compile — deterministic compile, names match).

Usage: python scripts/bucket_accounting.py [--model unetpp_r34]
         [--steps 6] [--trace-dir DIR]  (reuse an existing trace)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import importlib.util
import os
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
HBM_BW = 819e9  # v5e HBM GB/s

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1,
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
    """Compiled-HLO analysis.

    Returns (op_info, comp_flags) where op_info maps instruction name ->
    dict(kind, called, type_str, line) for every named instruction, and
    comp_flags maps computation name -> {"conv": bool, "reduce": bool,
    "conv_details": [...], "param_bytes": int}.
    """
    comp_flags: dict[str, dict] = {}
    op_info: dict[str, dict] = {}
    current_comp = None
    comp_re = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->")
    instr_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[^\s(]+))\s+([\w\-]+)\("
    )
    call_re = re.compile(r"calls=%?([\w.\-]+)")
    window_re = re.compile(r"window=\{size=(\d+)x(\d+)")

    for line in text.splitlines():
        mc = comp_re.match(line.strip()) if ("{" in line and "=" not in line.split("{")[0]) else None
        if mc:
            current_comp = mc.group(1)
            comp_flags.setdefault(
                current_comp,
                {"conv": False, "reduce": False, "conv_details": [],
                 "param_bytes": 0},
            )
            continue
        mi = instr_re.match(line)
        if not mi:
            continue
        name, type_str, opcode = mi.groups()
        if current_comp is not None:
            flags = comp_flags[current_comp]
            if opcode == "convolution":
                flags["conv"] = True
                mw = window_re.search(line)
                flags["conv_details"].append((line.strip(), type_str, mw))
            if opcode in ("reduce", "reduce-window"):
                flags["reduce"] = True
            if opcode == "parameter":
                flags["param_bytes"] += _shape_bytes(type_str)
        info = {"kind": opcode, "type": type_str, "called": None,
                "line": line.strip()}
        if opcode == "fusion":
            m = call_re.search(line)
            if m:
                info["called"] = m.group(1)
        op_info[name] = info
    return op_info, comp_flags


def conv_flops_and_cap(line: str, out_type: str) -> tuple[float, float]:
    """(flops, lane-cap seconds) for one convolution instruction."""
    # output shape
    m = _SHAPE.search(out_type)
    if not m:
        return 0.0, 0.0
    out_dims = [int(d) for d in m.group(2).split(",") if d]
    # operand shapes: first two shape literals after the '(' args
    args = line.split("convolution(", 1)[1]
    shapes = _SHAPE.findall(args)
    if len(shapes) < 2:
        return 0.0, 0.0
    rhs_dims = [int(d) for d in shapes[1][1].split(",") if d]
    mw = re.search(r"window=\{size=(\d+)x(\d+)", line)
    kh, kw = (int(mw.group(1)), int(mw.group(2))) if mw else (1, 1)
    # dim labels
    md = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", line)
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    if md:
        rhs_l = md.group(2)  # e.g. 01io or io01...
        i_pos, o_pos = rhs_l.index("i"), rhs_l.index("o")
        cin, cout_k = rhs_dims[i_pos], rhs_dims[o_pos]
        out_l = md.group(3)
        f_pos = out_l.index("f") if "f" in out_l else len(out_dims) - 1
        cout = out_dims[f_pos]
    else:
        cin, cout_k = rhs_dims[-2], rhs_dims[-1]
        cout = out_dims[-1]
    flops = 2.0 * out_elems * cin * kh * kw
    # feature-group counts: grouped convs have cin per-group already in rhs
    lane_frac = min(cout, 128) / 128.0
    cap = flops / (lane_frac * PEAK_BF16)
    return flops, cap


def bucket_of(name: str, op_info: dict, comp_flags: dict) -> str:
    info = op_info.get(name)
    if info is None:
        # profiler-only names (e.g. 'copy.1' variants) — classify by name
        base = re.match(r"[a-zA-Z\-_]+", name)
        kind = base.group(0) if base else name
        info = {"kind": kind, "called": None}
    kind = info["kind"]
    if kind == "convolution":
        return "conv"
    if kind == "fusion" and info.get("called"):
        flags = comp_flags.get(info["called"], {})
        if flags.get("conv"):
            return "conv_fusion"  # reported separately: overlap made visible
        if flags.get("reduce"):
            return "reduce"
        return "elementwise"
    if kind in ("copy", "transpose", "bitcast", "bitcast-convert",
                "copy-start", "copy-done", "all-reduce", "reshape"):
        return "copy"
    if kind in ("reduce", "reduce-window", "select-and-scatter"):
        return "reduce"
    if kind in ("custom-call",):
        return "custom-call"
    return "elementwise"


def profiled_times(trace_dir: str, steps: int) -> dict[str, float]:
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
                    times[name.lstrip("%")] += ev["dur_ps"] / 1e9 / steps
    return dict(times)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unetpp_r34")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--trace-dir", default=None)
    args = p.parse_args()

    import jax

    import bench

    b = args.batch or bench.DEFAULT_BATCH.get(args.model, 8)
    step, state, batch_data = bench.build(args.model, b, args.image_size)
    device_batch = jax.device_put(batch_data)
    compiled = step.lower(state, device_batch).compile()
    hlo_text = compiled.as_text()
    op_info, comp_flags = parse_hlo(hlo_text)

    trace_dir = args.trace_dir or profile_step.capture(
        args.model, b, args.steps, args.image_size
    )
    times = profiled_times(trace_dir, args.steps)
    print(f"trace: {trace_dir}   hlo ops: {len(op_info)}   "
          f"profiled ops: {len(times)}")

    buckets = collections.defaultdict(lambda: [0.0, 0])
    unmatched = 0.0
    for name, ms in times.items():
        bk = bucket_of(name, op_info, comp_flags)
        if name not in op_info:
            unmatched += ms
        buckets[bk][0] += ms
        buckets[bk][1] += 1

    # floors
    conv_floor = 0.0
    conv_flops = 0.0
    for name, info in op_info.items():
        if info["kind"] == "convolution":
            fl, cap = conv_flops_and_cap(info["line"], info["type"])
            conv_flops += fl
            conv_floor += cap
    # conv instructions inside fusions
    for cname, flags in comp_flags.items():
        for line, type_str, _ in flags["conv_details"]:
            fl, cap = conv_flops_and_cap(line, type_str)
            conv_flops += fl
            conv_floor += cap

    reduce_bytes = 0
    for name, info in op_info.items():
        if (
            info["kind"] == "fusion"
            and info.get("called")
            and comp_flags.get(info["called"], {}).get("reduce")
            and not comp_flags.get(info["called"], {}).get("conv")
        ):
            reduce_bytes += comp_flags[info["called"]]["param_bytes"]
    reduce_floor = reduce_bytes / HBM_BW

    total = sum(v[0] for v in buckets.values())
    print(f"\n{'bucket':<14}{'ms/step':>10}{'ops':>7}    floor")
    order = ["conv", "conv_fusion", "reduce", "copy", "custom-call",
             "elementwise"]
    for bk in order + [k for k in buckets if k not in order]:
        if bk not in buckets:
            continue
        ms, n = buckets[bk]
        floor = ""
        if bk == "conv":
            floor = f"lane-cap {conv_floor * 1e3:.1f} ms ({conv_flops / 1e12:.2f} TFLOP)"
        elif bk == "reduce":
            floor = (
                f"HBM {reduce_floor * 1e3:.1f} ms "
                f"({reduce_bytes / 1e9:.2f} GB as scheduled; "
                "eliminable by conv+stats fusion)"
            )
        elif bk == "copy":
            floor = "0 (eliminable)"
        print(f"{bk:<14}{ms:>10.2f}{n:>7}    {floor}")
    print(f"{'TOTAL':<14}{total:>10.2f}")
    if unmatched > 0.01:
        print(f"(profiled ops not found in this compile's HLO: "
              f"{unmatched:.2f} ms — name-matched by opcode prefix)")
    target = 177.8
    hard = conv_floor * 1e3
    print(
        f"\ndisjoint floors: conv lane-cap {hard:.1f} ms"
        f" + reduce-as-scheduled {reduce_floor * 1e3:.1f} ms; "
        f"target 180 p/s needs <= {target} ms/step."
    )


if __name__ == "__main__":
    main()
