"""Contract tests for the driver-facing entry points.

The driver consumes three artifacts every round: ``bench.py`` (one JSON line
on stdout), ``bench_train.py`` (one JSON line per target), and
``__graft_entry__.py`` (``entry``/``dryrun_multichip``).  A crash or a
format drift in any of them silently voids the round's recorded evidence,
so their output contracts are pinned here at the same subprocess level the
driver uses them (BENCH_SMALL=1 keeps the child on tiny CPU shapes; the
repo's persistent compile cache makes warm reruns cheap).
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke  # fast surface test below; subprocess runs opt out

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env_extra, timeout=900):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update(env_extra)
    return subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


def _json_lines(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert lines, "no stdout emitted"
    return [json.loads(ln) for ln in lines]


@pytest.mark.slow  # ~1 min: jits the tiny serving pipeline in a subprocess
def test_bench_small_json_contract():
    r = _run(["bench.py"], {"BENCH_SMALL": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    assert len(recs) == 1, r.stdout
    rec = recs[0]
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"].startswith("synthesis_rtf_batch")
    assert rec["unit"] == "x_realtime"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # warmup observability: compile-vs-transport must stay auditable
    assert "new_compile_cache_entries=" in r.stderr


@pytest.mark.slow  # ~1 min: jits a 2-step vqvae train loop in a subprocess
def test_bench_train_small_json_contract():
    r = _run(["bench_train.py"],
             {"BENCH_SMALL": "1", "BENCH_TARGET": "vqvae",
              "BENCH_TRAIN_STEPS": "2", "BENCH_NOTRACE": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    assert len(recs) == 1, r.stdout
    rec = recs[0]
    assert set(rec) == {"metric", "value", "unit", "device_ms_per_step",
                        "wall_ms_per_step"}
    assert rec["metric"] == "train_steps_per_sec_vqvae"
    assert rec["unit"] == "steps_per_sec"
    assert rec["value"] > 0 and rec["wall_ms_per_step"] > 0


def test_graft_entry_surface():
    # entry()/dryrun_multichip are compile-checked by the driver itself (and
    # by `python __graft_entry__.py` in the end-of-round warm); here pin the
    # import-time surface so a rename/refactor can't silently strand the
    # driver.
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    assert callable(g.entry)
    assert callable(g.dryrun_multichip)
    import inspect

    sig = inspect.signature(g.dryrun_multichip)
    assert "n_devices" in sig.parameters
