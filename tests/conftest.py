"""Test harness: force an 8-device virtual CPU backend before jax imports.

This is the standard JAX substitute for a TPU slice in CI (SURVEY.md §4):
sharding/collective tests exercise a real 8-way mesh without hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's concurrency-optimized thunk scheduler can deadlock programs
# with independent all-reduce chains on a virtual multi-device mesh (see
# __graft_entry__._reexec_virtual_cpus for the full analysis); sequential
# per-device thunk order is deadlock-free and free on this 1-core host.
if "concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
# XLA:CPU aborts collective rendezvous after 40s by default; on a small
# host (this env: ONE schedulable CPU) 8 virtual devices time-slice a
# single core, so peers legitimately straggle for minutes on the big
# sharded train-step programs.  Scale the stuck-detector to the emulation.
if "collective_call_warn_stuck" not in flags:
    flags += " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1500"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the axon sitecustomize forces jax_platforms="axon,cpu"; override before
# any backend initialisation so tests run on the virtual 8-CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """A module-level `smoke` mark plus a per-test `slow` mark means "fast
    file, slow outlier": when the user asked for the smoke tier (`-m smoke`),
    deselect those outliers so the tier keeps its <5-minute budget.

    Stripping the mark from ``item.own_markers`` is NOT enough — module-level
    ``pytestmark`` lives on the Module node and ``-m`` matches via
    ``iter_markers()`` over the whole parent chain — so deselect explicitly.
    """
    expr = config.getoption("-m") or ""
    if "smoke" not in expr or "slow" in expr:
        return
    keep, drop = [], []
    for item in items:
        if (item.get_closest_marker("slow") is not None
                and item.get_closest_marker("smoke") is not None):
            drop.append(item)
        else:
            keep.append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
