"""Per-op device profile of a full train step (any bench.py workload).

Captures a ``jax.profiler`` trace of N train steps on the real chip and
aggregates per-op device time directly from the XSpace protobuf with a
self-contained wire-format parser (no tensorflow dependency in this
image). Device-side durations are immune to the relay-latency noise that
makes host-side timing vary 2-3x (BASELINE.md measurement caveat), so
this is the only reliable optimization signal.

Usage:
    python scripts/profile_step.py --model unetpp_r34 [--steps 6] [--top 40]
    python scripts/profile_step.py --model dofa_base --group  # by op family

Output: total device busy time per step, then top ops by total time with
occurrence counts, and (with --group) aggregation by fusion-family name.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------- wire parser
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover - groups unused in xplane
            msg = f"unsupported wire type {wtype}"
            raise ValueError(msg)
        yield fnum, wtype, val


def parse_xspace(buf: bytes):
    """XSpace -> [plane]; plane = {name, lines, event_meta, stat_meta}."""
    planes = []
    for fnum, _, val in _fields(buf):
        if fnum != 1:
            continue
        plane = {"name": "", "lines": [], "event_meta": {}, "stat_meta": {}}
        for pf, _, pv in _fields(val):
            if pf == 2:
                plane["name"] = pv.decode()
            elif pf == 3:  # XLine
                line = {"name": "", "events": []}
                for lf, _, lv in _fields(pv):
                    if lf == 2:
                        line["name"] = lv.decode()
                    elif lf == 11:
                        line["display_name"] = lv.decode()
                    elif lf == 4:  # XEvent
                        ev = {"meta": 0, "dur_ps": 0, "stats": []}
                        for ef, _, evv in _fields(lv):
                            if ef == 1:
                                ev["meta"] = evv
                            elif ef == 3:
                                ev["dur_ps"] = evv
                            elif ef == 4:
                                st = {}
                                for sf, swt, sv in _fields(evv):
                                    if sf == 1:
                                        st["meta"] = sv
                                    elif sf in (2, 3, 4, 7):
                                        st["val"] = sv
                                    elif sf == 5:
                                        st["val"] = sv.decode(errors="replace")
                                ev["stats"].append(st)
                        line["events"].append(ev)
                plane["lines"].append(line)
            elif pf == 4:  # map<int64, XEventMetadata>
                key, meta = None, {}
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:
                        for ef, _, evv in _fields(mv):
                            if ef == 1:
                                key = evv
                            elif ef == 2:
                                meta["name"] = evv.decode(errors="replace")
                            elif ef == 3:
                                meta["display"] = evv.decode(errors="replace")
                if key is not None:
                    plane["event_meta"][key] = meta
            elif pf == 5:  # map<int64, XStatMetadata>
                key, name = None, ""
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:
                        for sf, _, sv in _fields(mv):
                            if sf == 1:
                                key = sv
                            elif sf == 2:
                                name = sv.decode(errors="replace")
                if key is not None:
                    plane["stat_meta"][key] = name
        planes.append(plane)
    return planes


# ------------------------------------------------------------------ capture
def capture(model: str, batch: int | None, steps: int, image_size: int) -> str:
    import jax

    import bench

    b = batch or bench.DEFAULT_BATCH.get(model, 8)
    step, state, batch_data = bench.build(model, b, image_size)
    device_batch = jax.device_put(batch_data)
    for _ in range(3):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])

    out = tempfile.mkdtemp(prefix=f"profile_{model}_")
    jax.profiler.start_trace(out)
    for _ in range(steps):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    return out


_FAMILY = re.compile(r"^(?:%?)([a-zA-Z][a-zA-Z0-9_-]*?)(?:[.\d]|$)")


def family(name: str) -> str:
    """Fusion-family key: 'fusion.123' -> fusion; keep custom-call names."""
    m = _FAMILY.match(name)
    return m.group(1) if m else name


def analyze(trace_dir: str, steps: int, top: int, group: bool) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    for path in paths:
        raw = open(path, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        planes = parse_xspace(raw)
        dev = [
            p
            for p in planes
            if "TPU" in p["name"] or p["name"].startswith("/device")
        ]
        if not dev:
            continue
        for plane in dev:
            agg: dict[str, list[float]] = collections.defaultdict(
                lambda: [0.0, 0]
            )
            total_ps = 0.0
            for line in plane["lines"]:
                # exact match: "Async XLA Ops" (DMA queues, overlapping
                # with compute) must NOT be summed with the compute line
                lname = line.get("display_name") or line["name"]
                if lname != "XLA Ops":
                    continue
                for ev in line["events"]:
                    name = plane["event_meta"].get(ev["meta"], {}).get(
                        "name", str(ev["meta"])
                    )
                    key = family(name) if group else name
                    agg[key][0] += ev["dur_ps"]
                    agg[key][1] += 1
                    total_ps += ev["dur_ps"]
            if not agg:
                continue
            per_step_ms = total_ps / 1e9 / steps
            print(f"\n== {plane['name']}  ({path.split('/')[-1]})")
            print(
                f"device busy: {per_step_ms:.2f} ms/step "
                f"({total_ps / 1e9:.1f} ms over {steps} steps)"
            )
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
            print(f"{'ms/step':>9}  {'%':>5}  {'n/step':>6}  op")
            for name, (ps, cnt) in rows:
                print(
                    f"{ps / 1e9 / steps:9.3f}  {100 * ps / total_ps:5.1f}"
                    f"  {cnt / steps:6.1f}  {name[:110]}"
                )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unetpp_r34")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group", action="store_true")
    p.add_argument("--trace-dir", default=None, help="re-analyze existing dir")
    args = p.parse_args()

    trace_dir = args.trace_dir or capture(
        args.model, args.batch, args.steps, args.image_size
    )
    print("trace:", trace_dir)
    analyze(trace_dir, args.steps, args.top, args.group)


if __name__ == "__main__":
    main()
