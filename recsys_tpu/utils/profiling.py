"""Profiling: device-time breakdown for a jitted step.

Replaces the reference's commented-out ProfilerHook + wall-clock prints
(deepfm/deepfm.py:195,207-210 — SURVEY §5.1) with `jax.profiler` traces plus
a parser that attributes device time to HLO fusions and maps them back to
framework source lines (the gather/scatter/matmul attribution used to drive
the hybrid embedding engine design).

Note on this environment: the TPU is reached through a tunnel where a host
value fetch costs ~50 ms and `block_until_ready` can return before device
work completes; wall-clock micro-timings lie. The device-side trace is the
only trustworthy signal — always profile, don't stopwatch.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile


def trace_step(fn, *args, trace_dir: str | None = None) -> str:
    """Run ``fn(*args)`` once under the JAX profiler; returns trace dir."""
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="recsys_trace_")
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.tree.map(
            lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape") else x,
            jax.tree.leaves(out)[0],
        )
    return trace_dir


def device_breakdown(trace_dir: str, top: int = 15) -> list[dict]:
    """Parse the trace → top device ops by total duration, with metadata."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        trace = json.load(f)
    # device tracks only: keep pids whose process_name mentions the
    # accelerator (host python/runtime frames otherwise drown the table)
    dev_pids = set()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = (e.get("args") or {}).get("name", "")
            if any(t in pname for t in ("TPU", "/device:", "XLA Op")):
                dev_pids.add(e.get("pid"))
    dur = collections.Counter()
    cnt = collections.Counter()
    args_by_name: dict = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "?")
            # keep only device-level op events (skip python/runtime frames
            # and the numeric step-lane aggregates)
            if name.startswith("$") or "/" in name[:1] or name.isdigit():
                continue
            dur[name] += e["dur"]
            cnt[name] += 1
            if e.get("args"):
                args_by_name.setdefault(name, e["args"])
    out = []
    for name, d in dur.most_common(top):
        out.append({
            "op": name,
            "total_ms": round(d / 1e3, 3),
            "count": cnt[name],
            "args": args_by_name.get(name, {}),
        })
    return out


def annotate_with_hlo(rows: list[dict], compiled_text: str) -> list[dict]:
    """Attach op_name/source_file metadata from compiled HLO text."""
    for row in rows:
        m = re.search(
            rf'%?{re.escape(row["op"])} = [^\n]+', compiled_text
        )
        if m:
            line = m.group(0)
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            row["hlo"] = line[:160]
            if meta:
                om = re.search(r'op_name="([^"]*)"', meta.group(1))
                sf = re.search(r'source_file="([^"]*)"', meta.group(1))
                row["op_name"] = om.group(1) if om else None
                row["source_file"] = sf.group(1) if sf else None
    return rows


def print_breakdown(rows: list[dict]) -> None:
    for r in rows:
        src = r.get("op_name") or ""
        print(f"{r['total_ms']:10.2f} ms  x{r['count']:4d}  {r['op'][:40]:40s}"
              f"  {src[:80]}")
