"""Device mesh + parameter-partitioning rules (the framework's distribution
layer — replaces the reference's HF-Accelerate DDP, train.py:88,132-133).

Design (SPMD, scaling-book style): one global ``jax.sharding.Mesh`` with a
``data`` axis (batch sharding; gradient all-reduce becomes a compiler-inserted
``psum`` riding ICI) and a ``model`` axis (tensor-parallel sharding of the GPT
matmuls).  All training/inference code is written against global arrays under
``jax.jit``; shardings here are layout annotations, so any (data, model)
factorisation is semantically identical — including (N, 1) pure-DP, which is
all the reference supported.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.  ``data=-1`` takes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Parameter partitioning (tensor parallel over the GPT's matmuls)
# ---------------------------------------------------------------------------

# (path regex, PartitionSpec). First match wins; default is full replication.
# Paths are '/'-joined flax param paths, e.g.
#   gpt/gpt/h_0/attn/c_attn/dense/kernel
PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    # GPT attention: QKV column-parallel, output row-parallel (Megatron layout)
    (r".*attn/c_attn/dense/kernel", P(None, MODEL_AXIS)),
    (r".*attn/c_attn/dense/bias", P(MODEL_AXIS)),
    (r".*attn/c_proj/dense/kernel", P(MODEL_AXIS, None)),
    # GPT MLP: up column-parallel, down row-parallel
    (r".*h_\d+/c_fc/dense/kernel", P(None, MODEL_AXIS)),
    (r".*h_\d+/c_fc/dense/bias", P(MODEL_AXIS)),
    (r".*h_\d+/c_proj/dense/kernel", P(MODEL_AXIS, None)),
    # Output heads: vocab-sharded logits
    (r".*mel_head/dense/kernel", P(None, MODEL_AXIS)),
    (r".*text_head/dense/kernel", P(None, MODEL_AXIS)),
    # Large embedding tables: vocab-sharded rows
    (r".*gpt/mel_embedding/embedding", P(MODEL_AXIS, None)),
)


def _spec_for(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def partition_specs(tree: Any,
                    rules: Sequence[Tuple[str, P]] = PARTITION_RULES,
                    mesh: Optional[Mesh] = None) -> Any:
    """Map a pytree of arrays to a matching pytree of PartitionSpecs.

    With ``mesh`` given, axes whose size doesn't divide the mesh axis are
    demoted to replication (e.g. the 257-wide text head under model=2).
    """

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    specs = {}
    for path, leaf in flat:
        name = "/".join(_key_str(k) for k in path)
        spec = _spec_for(name, rules)
        # drop sharding on axes the leaf doesn't have or can't tile
        if len(spec) > getattr(leaf, "ndim", 0):
            spec = P()
        elif mesh is not None:
            fixed = []
            for i, axis in enumerate(spec):
                if axis is not None and leaf.shape[i] % mesh.shape[axis] != 0:
                    axis = None
                fixed.append(axis)
            spec = P(*fixed)
        specs[name] = spec
    return jax.tree_util.tree_map_with_path(
        lambda p, _: specs["/".join(_key_str(k) for k in p)], tree)


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def shard_tree(tree: Any, mesh: Mesh,
               rules: Sequence[Tuple[str, P]] = PARTITION_RULES) -> Any:
    """device_put a pytree with rule-derived NamedShardings."""
    specs = partition_specs(tree, rules, mesh=mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Shard every leaf's ``batch_axis`` over the data axis."""

    def put(x):
        spec = [None] * x.ndim
        if x.ndim > batch_axis and x.shape[batch_axis] % mesh.shape[DATA_AXIS] == 0:
            spec[batch_axis] = DATA_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
