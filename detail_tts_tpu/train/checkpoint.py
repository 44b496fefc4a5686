"""Checkpointing: Orbax-backed save/restore of the full train state.

Replaces the reference's single-file ``torch.save({step, epoch, G, D, G_opt,
D_opt})`` + keep-3 mtime GC (train.py:139-175, log_utils.py:66) with Orbax
(async-capable, multi-host-safe).  The reference's deliberately lax loader
(silent shape tolerance for staged training, train.py:163-168) becomes an
explicit ``partial=True`` restore that keeps current values for missing or
shape-mismatched leaves and reports what it skipped.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _manager(directory: str, keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True))


def save_checkpoint(directory: str, state: Any, step: int,
                    keep: int = 3, wait: bool = False) -> None:
    """Save a TrainState pytree under ``directory/<step>``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, keep)
    mgr.save(step, args=ocp.args.PyTreeSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state_like: Any,
                       step: Optional[int] = None, partial: bool = True) -> Any:
    """Restore into the structure of ``state_like``.

    ``partial=True``: missing/shape-mismatched leaves keep their current
    values (the staged-training workflow: grow/attach modules between
    stages).
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    if not partial:
        out = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
        mgr.close()
        return out

    # Partial: restore raw pytree, then graft matching leaves.
    raw = mgr.restore(step, args=ocp.args.PyTreeRestore())
    mgr.close()
    return graft_pytree(state_like, raw, verbose=True)


def _wn_fold_np(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """kernel = g * v / ||v|| (norm over all axes but the last; the layouts
    in nn/common.py keep the weight-norm channel axis last)."""
    v32 = np.asarray(v, np.float32)
    norm = np.sqrt(np.sum(v32 ** 2, axis=tuple(range(v32.ndim - 1))))
    return v32 * (np.asarray(g, np.float32) / np.maximum(norm, 1e-12))


def _wn_crosswalk(name: str, loaded_flat: Dict[str, Any]):
    """Resolve a weight-norm parameterization mismatch between template and
    checkpoint: template (g, v) <- checkpoint kernel (unfold: v=w, g=||w||)
    or template kernel <- checkpoint (g, v) (fold).

    Only for model params (never optimizer moments: folding Adam mu/nu
    across parameterizations would fabricate wrong statistics).
    """
    if not (name.startswith("params/") or "/params/" in name):
        return None
    if name.endswith(("/v", "/g")):
        base = name[: name.rfind("/") + 1]
        w = loaded_flat.get(base + "kernel")
        if w is None:
            return None
        if name.endswith("/v"):
            return np.asarray(w)
        w32 = np.asarray(w, np.float32)
        return np.sqrt(np.sum(w32 ** 2, axis=tuple(range(w32.ndim - 1))))
    if name.endswith("/kernel"):
        base = name[: -len("kernel")]
        v, g = loaded_flat.get(base + "v"), loaded_flat.get(base + "g")
        if v is None or g is None:
            return None
        return _wn_fold_np(v, g)
    return None


def graft_pytree(current: Any, loaded: Any, verbose: bool = False) -> Any:
    """Copy leaves from ``loaded`` into ``current`` where path+shape match.

    Weight-norm-aware: a (g, v)-parameterized template restores from a
    folded checkpoint (and vice versa) by converting the model-param leaves
    in place (see nn/common.py weight_norm_reparam)."""
    cur_flat = jax.tree_util.tree_flatten_with_path(current)[0]
    loaded_flat = dict(
        ("/".join(_k(k) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0])
    skipped: List[str] = []

    def pick(path, leaf):
        name = "/".join(_k(k) for k in path)
        cand = loaded_flat.get(name)
        if cand is None:
            cand = _wn_crosswalk(name, loaded_flat)
        if cand is None:
            skipped.append(f"missing:{name}")
            return leaf
        if getattr(cand, "shape", None) != getattr(leaf, "shape", None):
            skipped.append(f"shape:{name} {getattr(cand, 'shape', '?')}"
                           f"!={getattr(leaf, 'shape', '?')}")
            return leaf
        return jax.numpy.asarray(cand, dtype=leaf.dtype) if hasattr(
            leaf, "dtype") else cand

    out = jax.tree_util.tree_map_with_path(pick, current)
    if verbose and skipped:
        print(f"checkpoint: kept current values for {len(skipped)} leaves "
              f"(first: {skipped[:5]})")
    return out


def _k(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "name"):  # GetAttrKey (flax struct / namedtuple fields)
        return str(k.name)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


# ---------------------------------------------------------------------------
# Inference-weight loading (serving surface)
# ---------------------------------------------------------------------------


def restore_variables(path: str, cfg) -> Dict[str, Any]:
    """Load ``{'params', 'vq_state'}`` for serving.

    Accepts: an Orbax checkpoint dir written by the trainer (TrainState
    layout), or a ``.msgpack`` flax-serialized variables file (the
    torch-checkpoint converter's output).
    """
    from detail_tts_tpu.models.synthesizer import SynthesizerTrn
    from detail_tts_tpu.train.step import init_variables

    # Serving always uses the FOLDED parameterization; trainer checkpoints
    # may carry the weight-norm (g, v) reparam (TrainConfig.weight_norm) —
    # fold on load.
    model = SynthesizerTrn(cfg)
    template = init_variables(model, cfg, jax.random.PRNGKey(0),
                              weight_norm=False)
    if path.endswith(".msgpack"):
        import flax.serialization

        with open(path, "rb") as f:
            data = f.read()
        try:
            return flax.serialization.from_bytes(template, data)
        except Exception as folded_err:
            # trainer-exported reparamed weights: load under the (g, v)
            # template, then fold for serving
            from detail_tts_tpu.nn.common import fold_weight_norm_tree

            template_wn = init_variables(model, cfg, jax.random.PRNGKey(0),
                                         weight_norm=True)
            try:
                loaded = flax.serialization.from_bytes(template_wn, data)
            except Exception:
                # neither parameterization matches: surface the ORIGINAL
                # error (likely a corrupt/truncated file or a different
                # config shape), not a misleading wn-template mismatch
                raise folded_err
            return fold_weight_norm_tree(loaded)

    import orbax.checkpoint as ocp

    mgr = _manager(path)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    raw = mgr.restore(step, args=ocp.args.PyTreeRestore())
    mgr.close()
    # TrainState layout: {'params': ..., 'vq_state': ...} at the top level;
    # graft_pytree folds any (g, v) params onto the folded template.
    src = {"params": raw["params"], "vq_state": raw["vq_state"]}
    return graft_pytree(template, src, verbose=True)


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    """Write serving weights as flax msgpack."""
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
