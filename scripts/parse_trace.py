"""Summarize a jax.profiler trace: device time grouped by op/program name.

Usage: python scripts/parse_trace.py /tmp/dtts_trace [top_n] [--raw]
       python scripts/parse_trace.py /tmp/dtts_trace [top_n] --by-source
       python scripts/parse_trace.py /tmp/dtts_trace [top_n] --by-op [--sub=STR]

Finds the newest *.trace.json.gz under the directory, groups complete events
by name (trailing digits/dots stripped), prints the top-N by total duration,
split by whether the event ran on a device ("/device:" or TensorFlow Op pids)
or host threads.

--by-source groups device time by the `source` (file:line) the XLA metadata
attributes each fused kernel to; --by-op groups by the jax scope path
(`tf_op`), truncated to the last model-meaningful components — both are the
kernel-census views used for the training roofline tables in CLAUDE.md.
--sub=STR keeps only events whose tf_op contains STR (e.g. --sub=transpose
to isolate a backward pass).

--gaps[=MS] prints the device-idle gaps longer than MS (default 5 ms) with
the program/kernel flanking each gap — the view that decides whether a wall
regression is device work or host/tunnel serialization (used for the
sustained-serving pipelining verdict in README).
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_device_events(root: Path):
    traces = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
    if not traces:
        sys.exit(f"no trace under {root}")
    path = traces[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    out = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pid_name.get(e.get("pid"), "")
        if "TPU" in proc or "/device" in proc or "XLA" in proc:
            out.append(e)
    return out


def _op_class(tf_op: str) -> str:
    """Collapse a jax scope path to a readable class: keep the trailing
    module scopes + primitive, drop jit/while/body plumbing and layer ids."""
    parts = [p for p in tf_op.rstrip(":").split("/")
             if p and p not in ("jit(step)", "while", "body", "closed_call",
                                "jit(_wrapped_fn)", "jit(wrapped)")]
    # strip per-layer indices so h_0..h_9 / layer_0.. aggregate
    parts = [re.sub(r"(_|\.)\d+$", "", p) for p in parts]
    return "/".join(parts[-4:])


def print_gaps(events, min_gap_ms: float):
    """Merge device-busy intervals; print idle gaps > min_gap_ms with the
    events flanking them (what finished before, what started after).

    Envelope spans (whole-program / step markers: no tf_op AND no source)
    are excluded — they cover host stalls between kernels and would mask
    exactly the gaps this view exists to find."""
    def is_kernel(e):
        a = e.get("args", {})
        return bool(a.get("tf_op") or a.get("source"))

    ivs = sorted((e["ts"], e["ts"] + e["dur"], e.get("name", ""))
                 for e in events if e.get("dur", 0) > 0 and is_kernel(e))
    if not ivs:
        sys.exit("no device events")
    span0, span1 = ivs[0][0], max(b for _, b, _ in ivs)
    busy, gaps = 0.0, []
    cur_s, cur_e, cur_name = ivs[0]
    for s, e_, name in ivs[1:]:
        if s > cur_e:  # idle gap
            gaps.append((cur_e, s - cur_e, cur_name, name))
            busy += cur_e - cur_s
            cur_s, cur_e, cur_name = s, e_, name
        else:
            if e_ > cur_e:
                cur_e, cur_name = e_, name
    busy += cur_e - cur_s
    span = span1 - span0
    print(f"span {span / 1e6:.3f}s  busy {busy / 1e6:.3f}s "
          f"({100 * busy / span:.1f}%)  idle {(span - busy) / 1e6:.3f}s "
          f"in {len(gaps)} gaps")
    big = [g for g in gaps if g[1] / 1e3 >= min_gap_ms]
    print(f"gaps >= {min_gap_ms:g} ms: {len(big)} "
          f"(total {sum(g[1] for g in big) / 1e6:.3f}s)")
    for ts, dur, before, after in big:
        print(f"  t={(ts - span0) / 1e6:8.3f}s  idle {dur / 1e3:8.1f} ms  "
              f"after [{before[:50]}] before [{after[:50]}]")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    root = Path(pos[0] if pos else "/tmp/dtts_trace")
    top_n = int(pos[1]) if len(pos) > 1 else 40
    raw = "--raw" in sys.argv  # keep full op names (fusion.123 stays distinct)
    by_source = "--by-source" in sys.argv
    by_op = "--by-op" in sys.argv
    sub = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--sub=")), None)

    events = load_device_events(root)

    gaps_arg = next((a for a in sys.argv if a.startswith("--gaps")), None)
    if gaps_arg:
        min_gap = float(gaps_arg.split("=", 1)[1]) if "=" in gaps_arg else 5.0
        print_gaps(events, min_gap)
        return

    strip = re.compile(r"[.\d]+$")
    agg = defaultdict(lambda: [0.0, 0])
    total_device = 0.0
    for e in events:
        eargs = e.get("args", {})
        tf_op = eargs.get("tf_op", "")
        if sub and sub not in tf_op:
            continue
        if by_source:
            name = eargs.get("source", "") or "<no source>"
        elif by_op:
            name = _op_class(tf_op) if tf_op else "<no tf_op>"
        else:
            name = e["name"] if raw else strip.sub("", e.get("name", ""))
        if (by_source or by_op) and not tf_op and not eargs.get("source"):
            # skip envelope spans (whole-program / step markers) in census views
            continue
        agg[name][0] += e["dur"] / 1e6
        agg[name][1] += 1
        total_device += e["dur"] / 1e6

    print(f"device total: {total_device:.3f}s over {sum(c for _, c in agg.values())} events")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{dur:8.3f}s {cnt:6d}x  {name[:150]}")


if __name__ == "__main__":
    main()
