"""Summarize a jax.profiler trace: device time grouped by op/program name.

Usage: python scripts/parse_trace.py /tmp/dtts_trace [top_n]
Finds the newest *.trace.json.gz under the directory, groups complete events
by name (trailing digits/dots stripped), prints the top-N by total duration,
split by whether the event ran on a device ("/device:" or TensorFlow Op pids)
or host threads.
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dtts_trace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    raw = "--raw" in sys.argv  # keep full op names (fusion.123 stays distinct)
    traces = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
    if not traces:
        sys.exit(f"no trace under {root}")
    path = traces[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # pid -> process name, to separate device streams from host threads
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")

    strip = re.compile(r"[.\d]+$")
    agg = defaultdict(lambda: [0.0, 0])
    total_device = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pid_name.get(e.get("pid"), "")
        is_device = "TPU" in proc or "/device" in proc or "XLA" in proc
        if not is_device:
            continue
        name = e["name"] if raw else strip.sub("", e.get("name", ""))
        agg[name][0] += e["dur"] / 1e6
        agg[name][1] += 1
        total_device += e["dur"] / 1e6

    print(f"device total: {total_device:.3f}s over {sum(c for _, c in agg.values())} events")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{dur:8.3f}s {cnt:6d}x  {name[:110]}")


if __name__ == "__main__":
    main()
