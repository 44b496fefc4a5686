"""Numerical parity of core NN ops against torch (CPU) ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from detail_tts_tpu.nn import common
from detail_tts_tpu.nn.coupling import ResidualCouplingBlock
from detail_tts_tpu.nn.rel_attention import (_absolute_to_relative,
                                             _relative_to_absolute)
from detail_tts_tpu.nn.style_encoder import MelStyleEncoder
from detail_tts_tpu.nn.wavenet import WN


def test_conv1d_matches_torch(rng, np_rng):
    x = np_rng.standard_normal((2, 50, 16)).astype(np.float32)
    m = common.Conv1d(24, 5, stride=2, padding=2, dilation=1)
    params = m.init(rng, x)
    y = m.apply(params, x)

    w = np.asarray(params["params"]["conv"]["kernel"])  # (k, in, out)
    b = np.asarray(params["params"]["conv"]["bias"])
    wt = torch.from_numpy(w.transpose(2, 1, 0))  # (out, in, k)
    yt = F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)), wt,
                  torch.from_numpy(b), stride=2, padding=2)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_grouped_conv1d_matches_torch(rng, np_rng):
    x = np_rng.standard_normal((2, 40, 16)).astype(np.float32)
    m = common.Conv1d(32, 41, stride=4, padding=20, groups=4)
    params = m.init(rng, x)
    y = m.apply(params, x)
    w = np.asarray(params["params"]["conv"]["kernel"])  # (k, in/g, out)
    b = np.asarray(params["params"]["conv"]["bias"])
    yt = F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(w.transpose(2, 1, 0)),
                  torch.from_numpy(b), stride=4, padding=20, groups=4)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_conv1d_tap_path_matches_torch(np_rng):
    """The tap-matmul lowering (_Conv1dCore: stride-1, ungrouped, k<=8,
    >=64 channels) must be an EXACT rewrite of the conv — including
    dilation, which offsets each tap by i*dilation."""
    for (k, d, pad) in [(1, 1, 0), (3, 1, 1), (5, 1, 2), (3, 2, 2),
                        (5, 4, 8), (7, 1, 3)]:
        x = np_rng.standard_normal((2, 40, 64)).astype(np.float32)
        m = common.Conv1d(64, k, stride=1, padding=pad, dilation=d)
        params = m.init(jax.random.PRNGKey(10 * k + d), x)
        # confirm the path selection predicate (guards against a silent
        # threshold change un-covering this test)
        core = common._Conv1dCore(features=64, kernel_size=k, stride=1,
                                  padding=pad, dilation=d, groups=1,
                                  use_bias=True,
                                  kernel_init=common.nn.initializers.zeros)
        assert k <= core._TAP_MAX_K and 64 >= core._TAP_MIN_CH
        y = m.apply(params, x)
        w = np.asarray(params["params"]["conv"]["kernel"])
        b = np.asarray(params["params"]["conv"]["bias"])
        yt = F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)),
                      torch.from_numpy(w.transpose(2, 1, 0)),
                      torch.from_numpy(b), stride=1, padding=pad, dilation=d)
        assert y.shape == (2, yt.shape[2], 64), (k, d, pad)
        np.testing.assert_allclose(np.asarray(y),
                                   yt.numpy().transpose(0, 2, 1),
                                   rtol=1e-4, atol=1e-5)


def test_conv_transpose1d_matches_torch(rng, np_rng):
    # the vq_dec config: k=3, stride=2, padding=1, output_padding=1
    # and the HiFi-GAN configs: (k=16,u=8,p=4), (k=8,u=4,p=2)
    for (k, s, p, op) in [(3, 2, 1, 1), (16, 8, 4, 0), (8, 4, 2, 0), (2, 2, 0, 0)]:
        x = np_rng.standard_normal((2, 30, 8)).astype(np.float32)
        m = common.ConvTranspose1d(12, k, stride=s, padding=p, output_padding=op)
        params = m.init(jax.random.PRNGKey(k), x)
        y = m.apply(params, x)
        w = np.asarray(params["params"]["kernel"])  # (k, out, in)
        b = np.asarray(params["params"]["bias"])
        wt = torch.from_numpy(w.transpose(2, 1, 0))  # (in, out, k)
        yt = F.conv_transpose1d(torch.from_numpy(x.transpose(0, 2, 1)), wt,
                                torch.from_numpy(b), stride=s, padding=p,
                                output_padding=op)
        assert y.shape == (2, yt.shape[2], 12), (k, s, p, op)
        np.testing.assert_allclose(np.asarray(y),
                                   yt.numpy().transpose(0, 2, 1),
                                   rtol=1e-4, atol=1e-5)


def test_groupnorm32_matches_torch(rng, np_rng):
    x = np_rng.standard_normal((2, 20, 64)).astype(np.float32)
    m = common.GroupNorm32(64)  # 64 channels -> 16 groups per the rule
    params = m.init(rng, x)
    y = m.apply(params, x)
    gn = torch.nn.GroupNorm(16, 64)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(params["params"]["GroupNorm_0"]["scale"])))
        gn.bias.copy_(torch.from_numpy(np.asarray(params["params"]["GroupNorm_0"]["bias"])))
        yt = gn(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_group_norm_group_rule():
    # diff_util.py:118-133
    assert common.group_norm_groups(768) == 32
    assert common.group_norm_groups(1536) == 32
    assert common.group_norm_groups(64) == 16
    assert common.group_norm_groups(16) == 8
    assert common.group_norm_groups(128) == 32


def test_relative_skew_roundtrip(np_rng):
    """relative->absolute must equal a direct gather of rel positions."""
    b, h, l = 2, 3, 7
    x = np_rng.standard_normal((b, h, l, 2 * l - 1)).astype(np.float32)
    absolute = np.asarray(_relative_to_absolute(jnp.asarray(x)))
    # direct: absolute[i, j] = x[i, (j - i) + (l-1)]
    for i in range(l):
        for j in range(l):
            np.testing.assert_allclose(absolute[:, :, i, j],
                                       x[:, :, i, j - i + l - 1], rtol=1e-6)
    back = np.asarray(_absolute_to_relative(jnp.asarray(absolute)))
    for i in range(l):
        for j in range(l):
            np.testing.assert_allclose(back[:, :, i, j - i + l - 1],
                                       absolute[:, :, i, j], rtol=1e-6)


def test_wn_shapes_and_masking(rng, np_rng):
    x = np_rng.standard_normal((2, 24, 32)).astype(np.float32)
    g = np_rng.standard_normal((2, 48)).astype(np.float32)
    lengths = jnp.asarray([24, 16])
    mask = common.sequence_mask(lengths, 24)[..., None]
    m = WN(32, 5, 1, 4, gin_channels=48)
    params = m.init(rng, x, mask, g)
    y = m.apply(params, x, mask, g)
    assert y.shape == x.shape
    # masked region must be exactly zero
    assert np.abs(np.asarray(y)[1, 16:]).max() == 0.0


def test_flow_invertibility(rng, np_rng):
    x = np_rng.standard_normal((2, 20, 32)).astype(np.float32)
    g = np_rng.standard_normal((2, 16)).astype(np.float32)
    mask = jnp.ones((2, 20, 1))
    m = ResidualCouplingBlock(32, 24, 5, 1, 4, gin_channels=16)
    params = m.init(rng, x, mask, g)
    fwd = m.apply(params, x, mask, g=g, reverse=False)
    back = m.apply(params, fwd, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-5)


def _torch_style_encoder_forward(p, x_np, mask_np, n_head=2):
    """Torch twin of MelStyleEncoder (modules.py:642-720) built from the
    flax params ``p`` (eval mode / no dropout).  x_np: (B, T, mel)."""
    t = lambda a: torch.from_numpy(np.asarray(a))
    x = t(x_np)
    mask = t(mask_np)  # (B, T), 1 = valid
    pad = mask == 0

    def linear(x, scope):
        w = t(p[scope]["dense"]["kernel"])  # (in, out)
        b = t(p[scope]["dense"]["bias"])
        return x @ w + b

    def mish(x):
        return x * torch.tanh(F.softplus(x))

    x = mish(linear(x, "spectral_0"))
    x = mish(linear(x, "spectral_1"))

    for scope in ("temporal_0", "temporal_1"):
        w = t(p[scope]["conv"]["conv"]["kernel"]).permute(2, 1, 0)  # (out,in,k)
        b = t(p[scope]["conv"]["conv"]["bias"])
        h = F.conv1d(x.transpose(1, 2), w, b, padding=(w.shape[-1] - 1) // 2)
        h = h.transpose(1, 2)
        a, g = h.chunk(2, dim=-1)
        x = x + a * torch.sigmoid(g)

    x = x.masked_fill(pad.unsqueeze(-1), 0)
    bsz, T, hidden = x.shape
    d_k = hidden // n_head
    q = linear(x, "slf_attn/w_qs").view(bsz, T, n_head, d_k)
    k = linear(x, "slf_attn/w_ks").view(bsz, T, n_head, d_k)
    v = linear(x, "slf_attn/w_vs").view(bsz, T, n_head, d_k)
    scores = torch.einsum("bthd,bshd->bhts", q, k) / np.power(hidden, 0.5)
    scores = scores.masked_fill(pad[:, None, None, :], float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    out = torch.einsum("bhts,bshd->bthd", attn, v).reshape(bsz, T, hidden)
    x = linear(out, "slf_attn/fc") + x

    x = linear(x, "fc")
    lens = mask.sum(dim=1, keepdim=True)
    pooled = (x * mask.unsqueeze(-1)).sum(dim=1) / lens
    return pooled.numpy()


def test_mel_style_encoder_matches_torch_twin(rng, np_rng):
    mel = np_rng.standard_normal((2, 30, 128)).astype(np.float32)
    mask = np.ones((2, 30), np.float32)
    mask[1, 20:] = 0.0
    m = MelStyleEncoder(n_mel_channels=128, style_vector_dim=64)
    params = m.init(rng, mel, mask)
    out = np.asarray(m.apply(params, mel, mask))
    assert out.shape == (2, 64)

    p = params["params"]
    flat = {
        "spectral_0": p["spectral_0"], "spectral_1": p["spectral_1"],
        "temporal_0": p["temporal_0"], "temporal_1": p["temporal_1"],
        "slf_attn/w_qs": p["slf_attn"]["w_qs"],
        "slf_attn/w_ks": p["slf_attn"]["w_ks"],
        "slf_attn/w_vs": p["slf_attn"]["w_vs"],
        "slf_attn/fc": p["slf_attn"]["fc"],
        "fc": p["fc"],
    }
    ref = _torch_style_encoder_forward(flat, mel, mask)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
