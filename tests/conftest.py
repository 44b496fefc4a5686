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


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
