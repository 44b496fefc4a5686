"""Weight-norm (g, v) reparameterization tests.

The reference trains WN / HiFi-GAN upsamples / resblocks / MPD convs under
``torch.nn.utils.weight_norm`` (vqvae/modules/modules.py:152-237 and 245-379,
vqvae/model_24k.py:244, 298-430); serving folds the pairs into plain kernels.
These tests pin:

* forward equivalence: (g, v) params fold to the same output as plain kernels
* torch gradient parity: d loss/d g and d loss/d v match torch weight_norm
  exactly for all three conv layouts (the gradient geometry is the point of
  the reparameterization — it is load-bearing for GAN stability)
* the fold/unfold tree utilities round-trip
* a real GAN train step updates both g and v
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.nn.common import (Conv1d, Conv2d, ConvTranspose1d,
                                      fold_weight_norm_tree,
                                      unfold_weight_norm_tree,
                                      weight_norm_reparam)

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _init_both(mod, x, seed=1):
    with weight_norm_reparam():
        v_wn = mod.init(jax.random.PRNGKey(seed), x)
        y_wn = mod.apply(v_wn, x)
    folded = fold_weight_norm_tree(v_wn)
    y_folded = mod.apply(folded, x)
    return v_wn, y_wn, folded, y_folded


def test_conv1d_reparam_matches_folded(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    mod = Conv1d(12, 3, padding=1, weight_norm=True)
    v_wn, y_wn, folded, y_folded = _init_both(mod, x)
    np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                               atol=1e-6)
    leaf = v_wn["params"]["conv"]
    assert set(leaf) == {"v", "g", "bias"}
    # g inits to ||v|| so the effective initial kernel equals v (i.e. the
    # plain kernel init distribution) — torch weight_norm wrap semantics
    np.testing.assert_allclose(np.asarray(folded["params"]["conv"]["kernel"]),
                               np.asarray(leaf["v"]), atol=1e-6)
    # context off -> plain kernel params, same module
    v_plain = mod.init(jax.random.PRNGKey(1), x)
    assert set(v_plain["params"]["conv"]) == {"kernel", "bias"}


def test_convtranspose1d_reparam_matches_folded(rng):
    x = jax.random.normal(rng, (2, 10, 6))
    mod = ConvTranspose1d(8, 4, stride=2, padding=1, weight_norm=True)
    v_wn, y_wn, folded, y_folded = _init_both(mod, x)
    np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                               atol=1e-6)
    # torch norms ConvTranspose per INPUT channel (dim=0 of (in, out, k));
    # ours is the last axis of (k, out, in)
    assert v_wn["params"]["g"].shape == (6,)


def test_conv2d_reparam_matches_folded(rng):
    x = jax.random.normal(rng, (2, 12, 5, 3))
    mod = Conv2d(7, kernel_size=(5, 1), strides=(3, 1),
                 padding=((2, 2), (0, 0)), weight_norm=True)
    v_wn, y_wn, folded, y_folded = _init_both(mod, x)
    np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                               atol=1e-6)
    assert v_wn["params"]["g"].shape == (7,)


def test_unfold_roundtrip_forward_equal(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    mod = Conv1d(12, 3, padding=1, weight_norm=True)
    v_wn, y_wn, folded, _ = _init_both(mod, x)
    # perturb g away from ||v|| so the fold is non-trivial
    v_wn = jax.tree_util.tree_map(lambda a: a, v_wn)
    v_wn["params"]["conv"]["g"] = v_wn["params"]["conv"]["g"] * 1.7
    folded = fold_weight_norm_tree(v_wn)
    refolded = unfold_weight_norm_tree(folded, v_wn)
    assert set(refolded["params"]["conv"]) == {"v", "g", "bias"}
    with weight_norm_reparam():
        y_a = mod.apply(v_wn, x)
        y_b = mod.apply(refolded, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), atol=1e-6)


# ---------------------------------------------------------------------------
# torch gradient parity
# ---------------------------------------------------------------------------


def _torch_grads(tmod, x_t):
    out = tmod(x_t)
    loss = (out * torch.sin(torch.arange(out.numel(),
                                         dtype=out.dtype).reshape(out.shape))
            ).sum()
    loss.backward()
    return out, loss


def _jax_loss(y):
    w = jnp.sin(jnp.arange(y.size, dtype=y.dtype).reshape(y.shape))
    return jnp.sum(y * w)


def test_torch_grad_parity_conv1d():
    """d loss/d g, d loss/d v identical to torch weight_norm (Conv1d)."""
    torch.manual_seed(3)
    tconv = torch.nn.utils.weight_norm(
        torch.nn.Conv1d(8, 12, 3, padding=1, dilation=1))
    x = np.random.default_rng(0).normal(size=(2, 8, 16)).astype(np.float32)
    x_t = torch.from_numpy(x)
    _, _ = _torch_grads(tconv, x_t)

    mod = Conv1d(12, 3, padding=1, weight_norm=True)
    params = {"params": {"conv": {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(-1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}}

    def loss_fn(p):
        with weight_norm_reparam():
            y = mod.apply(p, jnp.asarray(x.transpose(0, 2, 1)))
        return _jax_loss(y.transpose(0, 2, 1))

    grads = jax.grad(loss_fn)(params)["params"]["conv"]
    np.testing.assert_allclose(
        np.asarray(grads["v"]),
        tconv.weight_v.grad.numpy().transpose(2, 1, 0), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads["g"]),
        tconv.weight_g.grad.numpy().reshape(-1), atol=2e-4, rtol=1e-4)


def test_torch_grad_parity_convtranspose1d():
    torch.manual_seed(4)
    tconv = torch.nn.utils.weight_norm(
        torch.nn.ConvTranspose1d(6, 8, 4, stride=2, padding=1))
    x = np.random.default_rng(1).normal(size=(2, 6, 10)).astype(np.float32)
    x_t = torch.from_numpy(x)
    _torch_grads(tconv, x_t)

    mod = ConvTranspose1d(8, 4, stride=2, padding=1, weight_norm=True)
    params = {"params": {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(-1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}

    def loss_fn(p):
        with weight_norm_reparam():
            y = mod.apply(p, jnp.asarray(x.transpose(0, 2, 1)))
        return _jax_loss(y.transpose(0, 2, 1))

    grads = jax.grad(loss_fn)(params)["params"]
    np.testing.assert_allclose(
        np.asarray(grads["v"]),
        tconv.weight_v.grad.numpy().transpose(2, 1, 0), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads["g"]),
        tconv.weight_g.grad.numpy().reshape(-1), atol=2e-4, rtol=1e-4)


def test_torch_grad_parity_conv2d():
    torch.manual_seed(5)
    tconv = torch.nn.utils.weight_norm(
        torch.nn.Conv2d(3, 7, (5, 1), (3, 1), padding=(2, 0)))
    x = np.random.default_rng(2).normal(size=(2, 3, 12, 5)).astype(np.float32)
    x_t = torch.from_numpy(x)
    _torch_grads(tconv, x_t)

    mod = Conv2d(7, kernel_size=(5, 1), strides=(3, 1),
                 padding=((2, 2), (0, 0)), weight_norm=True)
    params = {"params": {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 3, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(-1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}

    def loss_fn(p):
        with weight_norm_reparam():
            y = mod.apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
        return _jax_loss(y.transpose(0, 3, 1, 2))

    grads = jax.grad(loss_fn)(params)["params"]
    np.testing.assert_allclose(
        np.asarray(grads["v"]),
        tconv.weight_v.grad.numpy().transpose(2, 3, 1, 0),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads["g"]),
        tconv.weight_g.grad.numpy().reshape(-1), atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# End-to-end: modules and the GAN train step
# ---------------------------------------------------------------------------


def test_wavenet_module_reparam_equals_folded(rng):
    from detail_tts_tpu.nn.wavenet import WN

    mod = WN(hidden_channels=16, kernel_size=5, dilation_rate=1, n_layers=3,
             gin_channels=12)
    x = jax.random.normal(rng, (2, 20, 16))
    mask = jnp.ones((2, 20, 1))
    g = jax.random.normal(jax.random.PRNGKey(7), (2, 12))
    with weight_norm_reparam():
        v_wn = mod.init(jax.random.PRNGKey(1), x, mask, g)
        y_wn = mod.apply(v_wn, x, mask, g)
    folded = fold_weight_norm_tree(v_wn)
    y_folded = mod.apply(folded, x, mask, g)
    np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                               atol=1e-5)
    # every reference-weight-normed conv carries (g, v)
    flat = {"/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                v_wn["params"])[0]}
    assert any(p.endswith("cond_layer/conv/g") for p in flat)
    assert any(p.endswith("in_0/conv/v") for p in flat)


def test_gan_step_updates_g_and_v():
    """A flowvae train step under TrainConfig.weight_norm moves both g and v
    (and the MPD's reparamed weights)."""
    from detail_tts_tpu.train.step import (dummy_batch, make_train_state,
                                           make_train_step)

    cfg = small_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, target="flowvae"))
    assert cfg.train.weight_norm  # torch-parity default

    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)

    batch = dummy_batch(cfg, batch_size=2, mel_frames=48, text_len=8)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    batch["mel"] = jax.random.normal(keys[0], batch["mel"].shape) * 2 - 6
    batch["raw_mel"] = batch["mel"]
    batch["spec"] = jnp.abs(jax.random.normal(keys[1], batch["spec"].shape))
    batch["raw_spec"] = batch["spec"]
    batch["wav"] = jax.random.uniform(keys[2], batch["wav"].shape,
                                      minval=-0.5, maxval=0.5)
    batch["raw_wav"] = batch["wav"]
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_gen_all"]))

    def changed_wn_leaves(before, after):
        moved_g, moved_v = False, False
        flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
        flat_a = dict(jax.tree_util.tree_flatten_with_path(after)[0])
        for path, b in flat_b:
            leaf = str(getattr(path[-1], "key", path[-1]))
            if leaf not in ("g", "v"):
                continue
            a = flat_a[path]
            if not np.allclose(np.asarray(a), np.asarray(b)):
                if leaf == "g":
                    moved_g = True
                else:
                    moved_v = True
        return moved_g, moved_v

    g_moved, v_moved = changed_wn_leaves(state.params, new_state.params)
    assert g_moved and v_moved, (g_moved, v_moved)
    dg_moved, dv_moved = changed_wn_leaves(state.d_params, new_state.d_params)
    assert dg_moved and dv_moved, (dg_moved, dv_moved)


def test_weight_norm_off_keeps_plain_kernels():
    from detail_tts_tpu.train.step import make_train_state

    cfg = small_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, target="flowvae",
                                       weight_norm=False))
    state, _, _ = make_train_state(cfg, jax.random.PRNGKey(0))
    leaves = {str(getattr(p[-1], "key", p[-1]))
              for p, _ in jax.tree_util.tree_flatten_with_path(
                  state.params)[0]}
    assert "v" not in leaves and "g" not in leaves


def test_graft_pytree_weight_norm_crosswalk(rng):
    """Checkpoint restore across parameterizations: a folded checkpoint
    grafts onto a (g, v) template (unfold) and vice versa (fold), forward-
    equivalently (train/checkpoint.py::_wn_crosswalk)."""
    from detail_tts_tpu.train.checkpoint import graft_pytree

    mod = Conv1d(12, 3, padding=1, weight_norm=True)
    x = jax.random.normal(rng, (2, 16, 8))
    with weight_norm_reparam():
        v_wn = mod.init(jax.random.PRNGKey(1), x)
    # perturb g so fold/unfold are non-trivial
    v_wn["params"]["conv"]["g"] = v_wn["params"]["conv"]["g"] * 1.3
    folded = fold_weight_norm_tree(v_wn)
    y_ref = np.asarray(mod.apply(folded, x))

    # folded checkpoint -> reparam template (resume training from serving)
    with weight_norm_reparam():
        tmpl_wn = mod.init(jax.random.PRNGKey(2), x)
    restored_wn = graft_pytree(tmpl_wn, folded)
    with weight_norm_reparam():
        y1 = np.asarray(mod.apply(restored_wn, x))
    np.testing.assert_allclose(y1, y_ref, atol=1e-5)

    # reparam checkpoint -> folded template (serve a trainer checkpoint)
    tmpl = mod.init(jax.random.PRNGKey(3), x)
    restored = graft_pytree(tmpl, v_wn)
    y2 = np.asarray(mod.apply(restored, x))
    np.testing.assert_allclose(y2, y_ref, atol=1e-5)
