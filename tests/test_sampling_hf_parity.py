"""Element-wise parity of ops/sampling.py vs transformers' logits warpers.

The reference decodes through HF generate with
RepetitionPenaltyLogitsProcessor(2.0) -> temperature(0.8) -> TopPLogitsWarper(0.8)
(vqvae/model_24k.py:782-792) and an opt-in TypicalLogitsWarper
(gpt/modules/typical_sampling.py).  SURVEY §7 names bit-exact warper parity
the #1 hard part; these tests pin it on random AND deliberately-tied logits.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import (LogitsProcessorList, RepetitionPenaltyLogitsProcessor,
                          TemperatureLogitsWarper, TopPLogitsWarper,
                          TypicalLogitsWarper)

from detail_tts_tpu.ops.sampling import (apply_repetition_penalty,
                                         apply_temperature, apply_top_p,
                                         apply_typical)

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below

V = 64
NEG = -float("inf")


def _cases():
    rng = np.random.default_rng(0)
    cases = [("random", rng.normal(size=(4, V)).astype(np.float32))]
    # deliberate ties straddling the nucleus boundary: blocks of equal logits
    tied = np.repeat(rng.normal(size=(4, V // 4)).astype(np.float32), 4, axis=1)
    cases.append(("tied-blocks", tied))
    # all-equal row (every token tied) + one dominant token rows
    flat = np.zeros((2, V), np.float32)
    flat[1, 7] = 10.0
    cases.append(("flat", flat))
    # bf16-quantized logits (the serving reality: fp32 logits off a bf16 matmul)
    bf = rng.normal(size=(4, V)).astype(np.float32)
    bf = torch.tensor(bf).to(torch.bfloat16).float().numpy()
    cases.append(("bf16-quantized", bf))
    return cases


def _assert_same(ours: jnp.ndarray, theirs: torch.Tensor, tag: str):
    o = np.asarray(ours, dtype=np.float32)
    t = theirs.float().numpy()
    same_inf = np.isneginf(o) == np.isneginf(t)
    assert same_inf.all(), f"{tag}: filtered sets differ at {np.argwhere(~same_inf)[:8]}"
    finite = ~np.isneginf(o)
    np.testing.assert_allclose(o[finite], t[finite], rtol=1e-6, atol=1e-6,
                               err_msg=tag)


def _assert_distribution_equivalent(logits, ours, theirs, tag):
    """Tie-robust parity: identical kept-count per logit value per row.

    torch.sort(stable=False) orders exact ties arbitrarily (kernel- and
    size-dependent), so WHICH copy of a tied value survives the nucleus
    boundary is unspecified in HF itself.  The sampling distribution only
    depends on how many copies of each value survive — assert that, plus
    that surviving logits are unchanged.
    """
    o = np.asarray(ours, dtype=np.float32)
    t = theirs.float().numpy()
    for b in range(logits.shape[0]):
        for v in np.unique(logits[b]):
            at = logits[b] == v
            kept_o = np.sum(~np.isneginf(o[b]) & at)
            kept_t = np.sum(~np.isneginf(t[b]) & at)
            assert kept_o == kept_t, (tag, b, v, kept_o, kept_t)
    keep = ~np.isneginf(o)
    np.testing.assert_allclose(o[keep], logits[keep], rtol=1e-6, err_msg=tag)


@pytest.mark.parametrize("top_p", [0.8, 0.5, 0.95])
@pytest.mark.parametrize("name,logits", _cases())
def test_top_p_matches_hf(name, logits, top_p):
    warper = TopPLogitsWarper(top_p=top_p)
    theirs = warper(None, torch.tensor(logits))
    ours = apply_top_p(jnp.asarray(logits), top_p)
    has_ties = any(len(np.unique(row)) < len(row) for row in logits)
    if has_ties:
        _assert_distribution_equivalent(logits, ours, theirs,
                                        f"top_p={top_p} {name}")
    else:
        _assert_same(ours, theirs, f"top_p={top_p} {name}")


@pytest.mark.parametrize("name,logits", _cases())
def test_temperature_matches_hf(name, logits):
    warper = TemperatureLogitsWarper(temperature=0.8)
    theirs = warper(None, torch.tensor(logits))
    ours = apply_temperature(jnp.asarray(logits), 0.8)
    _assert_same(ours, theirs, f"temp {name}")


@pytest.mark.parametrize("mass", [0.9, 0.5])
@pytest.mark.parametrize("name,logits", _cases())
def test_typical_matches_hf(name, logits, mass):
    warper = TypicalLogitsWarper(mass=mass)
    theirs = warper(None, torch.tensor(logits))
    ours = apply_typical(jnp.asarray(logits), mass)
    o, t = np.asarray(ours), theirs.float().numpy()
    # typicality scores can tie under symmetric distributions; HF breaks the
    # tie by sort position, we by value -> compare the kept SET by value and
    # the kept probability mass instead of element indices for tied rows
    same_inf = np.isneginf(o) == np.isneginf(t)
    if not same_inf.all():
        p = torch.softmax(torch.tensor(logits), -1).numpy()
        kept_o = np.where(np.isneginf(o), 0.0, p).sum(-1)
        kept_t = np.where(np.isneginf(t), 0.0, p).sum(-1)
        np.testing.assert_allclose(kept_o, kept_t, atol=1e-6,
                                   err_msg=f"typical mass={mass} {name}")
    finite = ~np.isneginf(o) & ~np.isneginf(t)
    np.testing.assert_allclose(o[finite], t[finite], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("penalty", [2.0, 1.3])
def test_repetition_penalty_matches_hf(penalty):
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, V)).astype(np.float32)
    logits[0, 5] = 0.0  # exact-zero logit: HF 0/p == ours 0*p
    # seen ids include repeats + the forced filler id 1 (reference prefix pad)
    input_ids = torch.tensor([[1, 1, 5, 9, 9, 20],
                              [1, 2, 3, 4, 5, 6],
                              [63, 63, 63, 0, 1, 2]])
    proc = RepetitionPenaltyLogitsProcessor(penalty=penalty)
    theirs = proc(input_ids, torch.tensor(logits))
    seen = np.zeros((3, V), bool)
    for b in range(3):
        seen[b, input_ids[b].numpy()] = True
    ours = apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(seen),
                                    penalty)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-6,
                               atol=1e-6)


def test_full_reference_warper_chain():
    """rep-pen 2.0 -> temp 0.8 -> top_p 0.8 end-to-end, as HF generate runs it."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, V)).astype(np.float32) * 3
    input_ids = torch.tensor([[1, 1, 8192 % V, 3], [1, 1, 2, 3]])
    chain = LogitsProcessorList([
        RepetitionPenaltyLogitsProcessor(2.0),
        TemperatureLogitsWarper(0.8),
        TopPLogitsWarper(0.8),
    ])
    theirs = chain(input_ids, torch.tensor(logits))
    seen = np.zeros((2, V), bool)
    for b in range(2):
        seen[b, input_ids[b].numpy()] = True
    x = apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(seen), 2.0)
    x = apply_temperature(x, 0.8)
    x = apply_top_p(x, 0.8)
    _assert_same(x, theirs, "chain")


def test_top_p_prefix_reconstruction_fuzz():
    """The arithmetic (sort + boundary compare) top_p must equal the direct
    scatter-by-stable-sort construction on randomized logits with ties."""
    rng = np.random.default_rng(3)
    for trial in range(20):
        vv = int(rng.integers(4, 200))
        p = float(rng.uniform(0.05, 0.99))
        logits = rng.normal(size=(5, vv)).astype(np.float32)
        if trial % 2:  # inject ties, including at the nucleus boundary
            q = rng.integers(1, 5)
            logits = np.round(logits * q) / q
        ours = np.asarray(apply_top_p(jnp.asarray(logits), p))
        # direct construction: stable argsort, prefix removal, scatter back
        order = np.argsort(logits, axis=-1, kind="stable")
        slog = np.take_along_axis(logits, order, axis=-1)
        probs = torch.softmax(torch.tensor(slog), -1).numpy()
        cum = np.cumsum(probs, axis=-1)
        rem_sorted = cum <= (1.0 - p)
        rem_sorted[:, -1] = False
        rem = np.zeros_like(rem_sorted)
        np.put_along_axis(rem, order, rem_sorted, axis=-1)
        expect = np.where(rem, -np.inf, logits)
        same_inf = np.isneginf(ours) == np.isneginf(expect)
        assert same_inf.all(), (trial, vv, p, np.argwhere(~same_inf)[:5])
