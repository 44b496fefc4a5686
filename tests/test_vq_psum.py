"""The quantizer's explicit ``axis_name`` psum path under shard_map.

train/step.py relies on jit global-array SPMD (the compiler inserts the
collective sums for the EMA stats); the ``axis_name`` branch in
models/quantizer.py is the per-shard variant for shard_map-style trainers.
This test proves the two are the SAME update: an 8-way shard_map step with
psum'd cluster statistics must produce bit-comparable codebook state to one
global-batch call — i.e. every replica ends with the identical, globally
synced codebook (the property the reference lost by leaving
``broadcast_tensors`` commented out, core_vq.py:150-151,169).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detail_tts_tpu.models.quantizer import EuclideanCodebook

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _shard_map(fn, mesh, in_specs, out_specs):
    try:  # jax >= 0.7 spells it jax.shard_map
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)
    except AttributeError:
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def test_vq_psum_shardmap_matches_global_update():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    dim, size, n = 8, 32, 64

    rng = np.random.default_rng(31)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    state0 = {
        "inited": jnp.ones((), bool),
        "cluster_size": jnp.asarray(
            rng.uniform(0.5, 8.0, (size,)).astype(np.float32)),
        "embed": jnp.asarray(rng.normal(0, 1, (size, dim)).astype(np.float32)),
        "embed_avg": jnp.asarray(
            rng.normal(0, 1, (size, dim)).astype(np.float32)),
    }
    module = EuclideanCodebook(codebook_size=size, dim=dim,
                               threshold_ema_dead_code=2.0)

    # ---- oracle: one global-batch call, no axis_name (the jit-SPMD path)
    (_, ids_g), mut_g = module.apply(
        {"vq_state": state0}, jnp.asarray(x), train=True,
        mutable=["vq_state"], rngs={"vq": jax.random.PRNGKey(0)})
    global_state = mut_g["vq_state"]

    # ---- shard_map: batch split 8 ways, per-shard stats psum'd over 'data'
    def shard_fn(state, xs):
        (q, ids), mut = module.apply(
            {"vq_state": state}, xs, train=True, axis_name="data",
            mutable=["vq_state"], rngs={"vq": jax.random.PRNGKey(0)})
        return mut["vq_state"], ids

    sharded = _shard_map(shard_fn, mesh,
                         in_specs=(P(), P("data")),
                         out_specs=(P(), P("data")))
    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    state_sh = jax.device_put(state0, NamedSharding(mesh, P()))
    new_state, ids_sh = jax.jit(sharded)(state_sh, x_sh)

    np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_sh))
    for key in ("cluster_size", "embed_avg", "embed"):
        np.testing.assert_allclose(
            np.asarray(global_state[key]), np.asarray(new_state[key]),
            rtol=1e-5, atol=1e-6, err_msg=key)

    # every replica holds the identical codebook (replicated output shards)
    for shard in new_state["embed"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      np.asarray(new_state["embed"]))


def test_vq_psum_kmeans_init_consistent_across_replicas():
    """First-batch k-means init under shard_map: the all-gathered sample
    set makes every replica compute the identical codebook."""
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    dim, size, n = 4, 16, 64

    rng = np.random.default_rng(37)
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    state0 = {
        "inited": jnp.zeros((), bool),
        "cluster_size": jnp.zeros((size,), jnp.float32),
        "embed": jnp.zeros((size, dim), jnp.float32),
        "embed_avg": jnp.zeros((size, dim), jnp.float32),
    }
    module = EuclideanCodebook(codebook_size=size, dim=dim, kmeans_iters=5,
                               threshold_ema_dead_code=0.0)

    def shard_fn(state, xs):
        (_, ids), mut = module.apply(
            {"vq_state": state}, xs, train=True, axis_name="data",
            mutable=["vq_state"], rngs={"vq": jax.random.PRNGKey(3)})
        return mut["vq_state"], ids

    sharded = _shard_map(shard_fn, mesh, in_specs=(P(), P("data")),
                         out_specs=(P(), P("data")))
    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    state_sh = jax.device_put(state0, NamedSharding(mesh, P()))
    new_state, _ = jax.jit(sharded)(state_sh, x_sh)

    assert bool(new_state["inited"])
    embed = np.asarray(new_state["embed"])
    assert np.isfinite(embed).all() and np.abs(embed).sum() > 0
    for shard in new_state["embed"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), embed)
