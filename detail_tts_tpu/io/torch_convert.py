"""Reference PyTorch checkpoint -> JAX pytree converter.

Maps the reference ``SynthesizerTrn`` state dict (vqvae/model_24k.py:510,
checkpoint format ``{step, epoch, G, D, G_opt, D_opt}`` or ``{'model'|'G'}``,
train.py:139-150 / prepare/load_infer.py:22-26) onto this framework's
``{'params', 'vq_state'}`` variables.

Layout conversions:
* torch Conv1d       (out, in/g, k)  -> flax nn.Conv kernel (k, in/g, out)
* torch ConvTranspose1d (in, out, k) -> kernel (k, out, in)
  (both are axes (2, 1, 0))
* torch Linear       (out, in)       -> Dense kernel (in, out)
* HF GPT-2 Conv1D    (in, out)       -> Dense kernel as-is
* LayerNorm/GroupNorm weight -> scale; VITS gamma/beta -> scale/bias
* weight_norm (weight_g, weight_v) pairs are folded:
  w = g * v / ||v||_{dims>=1}  (inference never needs the reparam)

Known live-path-unused reference entries are skipped (gpt.gpt.wte — the HF
wte is bypassed via inputs_embeds; gpt.inference_model.* — shared copies;
diffusion.code_{embedding,converter} and diffusion.mel_head — the dead
code-input path of DiffusionTts).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

# transforms -----------------------------------------------------------------


def t_conv(w):  # torch conv / conv-transpose -> flax
    return np.transpose(w, (2, 1, 0))


def t_linear(w):
    return np.transpose(w)


def t_id(w):
    return w


IGNORED = (
    "gpt.gpt.wte.",
    "gpt.inference_model.",
    "diffusion.code_embedding.",
    "diffusion.code_converter.",
    "diffusion.mel_head.",
)

# ---------------------------------------------------------------------------
# Name translation
# ---------------------------------------------------------------------------


def _norm_suffix(leaf: str) -> Optional[str]:
    return {"weight": "scale", "bias": "bias",
            "gamma": "scale", "beta": "bias"}.get(leaf)


def _style_encoder(rest: str, base: str) -> Optional[Tuple[str, Callable]]:
    """MelStyleEncoder submap (modules.py:642-720)."""
    m = re.fullmatch(r"spectral\.(0|3)\.fc\.(weight|bias)", rest)
    if m:
        idx = "0" if m.group(1) == "0" else "1"
        return (f"{base}/spectral_{idx}/dense/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_linear if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"temporal\.(\d)\.conv1\.conv\.(weight|bias)", rest)
    if m:
        return (f"{base}/temporal_{m.group(1)}/conv/conv/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_conv if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"slf_attn\.(w_qs|w_ks|w_vs|fc)\.(weight|bias)", rest)
    if m:
        return (f"{base}/slf_attn/{m.group(1)}/dense/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_linear if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"fc\.fc\.(weight|bias)", rest)
    if m:
        return (f"{base}/fc/dense/"
                + ("kernel" if m.group(1) == "weight" else "bias"),
                t_linear if m.group(1) == "weight" else t_id)
    return None


def _conv_entry(base: str, leaf: str) -> Tuple[str, Callable]:
    return (f"{base}/conv/" + ("kernel" if leaf == "weight" else "bias"),
            t_conv if leaf == "weight" else t_id)


def _wn(rest: str, base: str) -> Optional[Tuple[str, Callable]]:
    """WaveNet ``enc`` submap (modules.py:152-237)."""
    m = re.fullmatch(r"(in_layers|res_skip_layers|cond_layer)"
                     r"(?:\.(\d+))?\.(weight|bias)", rest)
    if not m:
        return None
    group, idx, leaf = m.groups()
    sub = {"in_layers": f"in_{idx}", "res_skip_layers": f"res_skip_{idx}",
           "cond_layer": "cond_layer"}[group]
    return _conv_entry(f"{base}/{sub}", leaf)


def _diff_resblock(rest: str, base: str) -> Optional[Tuple[str, Callable]]:
    """diff_model ResBlock submap (diff_model.py:59-120)."""
    m = re.fullmatch(r"in_layers\.(0|2)\.(weight|bias)", rest)
    if m:
        if m.group(1) == "0":
            return f"{base}/in_norm/GroupNorm_0/{_norm_suffix(m.group(2))}", t_id
        return _conv_entry(f"{base}/in_conv", m.group(2))
    m = re.fullmatch(r"out_layers\.(0|3)\.(weight|bias)", rest)
    if m:
        if m.group(1) == "0":
            return f"{base}/out_norm/GroupNorm_0/{_norm_suffix(m.group(2))}", t_id
        return _conv_entry(f"{base}/out_conv", m.group(2))
    m = re.fullmatch(r"emb_layers\.1\.(weight|bias)", rest)
    if m:
        return (f"{base}/emb/dense/"
                + ("kernel" if m.group(1) == "weight" else "bias"),
                t_linear if m.group(1) == "weight" else t_id)
    return None


def _diff_attn(rest: str, base: str) -> Optional[Tuple[str, Callable]]:
    """diff_util AttentionBlock submap (diff_util.py:172-231)."""
    m = re.fullmatch(r"norm\.(weight|bias)", rest)
    if m:
        return f"{base}/norm/GroupNorm_0/{_norm_suffix(m.group(1))}", t_id
    m = re.fullmatch(r"(qkv|proj_out)\.(weight|bias)", rest)
    if m:
        return _conv_entry(f"{base}/{m.group(1)}", m.group(2))
    if rest == "relative_pos_embeddings.relative_attention_bias.weight":
        return f"{base}/rel_pos/embedding", t_id
    return None


def translate(name: str, diffusion_layers: int = 10
              ) -> Optional[Tuple[str, Callable]]:
    """Reference state-dict name -> ('params/...' path, transform) or None.

    ``diffusion_layers``: the checkpoint's ``diffusion.num_layers`` — the
    reference appends 3 plain ResBlocks AFTER that many DiffusionLayers in
    one ``layers`` list (diff_model.py:202-203), so trailing-block indices
    are relative to it.
    """
    for pre in IGNORED:
        if name.startswith(pre):
            return None

    # ---- quantizer (quantize.py / core_vq.py)
    m = re.fullmatch(r"quantizer\.vq\.layers\.(\d+)\._codebook\.(\w+)", name)
    if m:
        return f"vq_state/quantizer/layer_{m.group(1)}/codebook/{m.group(2)}", t_id
    m = re.fullmatch(r"quantizer\.vq\.layers\.(\d+)\.(project_in|project_out)"
                     r"\.(weight|bias)", name)
    if m:
        return (f"params/quantizer/layer_{m.group(1)}/{m.group(2)}/dense/"
                + ("kernel" if m.group(3) == "weight" else "bias"),
                t_linear if m.group(3) == "weight" else t_id)

    # ---- vq_enc / vq_dec sequentials (model_24k.py:606-627)
    m = re.fullmatch(r"vq_(enc|dec)\.(\d)\.(weight|bias)", name)
    if m:
        kind, idx, leaf = m.groups()
        if idx == "1":
            return (f"params/vq_{kind}_norm/LayerNorm_0/"
                    f"{'scale' if leaf == 'weight' else 'bias'}", t_id)
        if kind == "enc":
            sub = {"3": "vq_enc_conv0", "5": "vq_enc_conv1",
                   "7": "vq_enc_conv2"}[idx]
            return _conv_entry(f"params/{sub}", leaf)
        if idx in ("3", "5"):  # ConvTranspose1d: params live directly
            sub = {"3": "vq_dec_up0", "5": "vq_dec_up1"}[idx]
            return (f"params/{sub}/" + ("kernel" if leaf == "weight" else "bias"),
                    t_conv if leaf == "weight" else t_id)
        return _conv_entry("params/vq_dec_conv", leaf)

    # ---- top-level convs
    m = re.fullmatch(r"in_proj\.(weight|bias)", name)
    if m:
        return _conv_entry("params/in_proj", m.group(1))

    # ---- style encoders
    for ref, mine in (("ref_enc.", "params/ref_enc"),
                      ("vq_ref_enc.", "params/vq_ref_enc"),
                      ("gpt.conditioning_encoder.",
                       "params/gpt/conditioning_encoder")):
        if name.startswith(ref):
            return _style_encoder(name[len(ref):], mine)

    # ---- enc_p (SpecEncoder, model_24k.py:71-124)
    m = re.fullmatch(r"enc_p\.encoder\.attn_layers\.(\d+)\.conv_([qkvo])"
                     r"\.(weight|bias)", name)
    if m:
        return _conv_entry(
            f"params/enc_p/encoder/attn_{m.group(1)}/conv_{m.group(2)}",
            m.group(3))
    m = re.fullmatch(r"enc_p\.encoder\.attn_layers\.(\d+)\.(emb_rel_[kv])", name)
    if m:
        return f"params/enc_p/encoder/attn_{m.group(1)}/{m.group(2)}", t_id
    m = re.fullmatch(r"enc_p\.encoder\.ffn_layers\.(\d+)\.(conv_[12])"
                     r"\.(weight|bias)", name)
    if m:
        return _conv_entry(
            f"params/enc_p/encoder/ffn_{m.group(1)}/{m.group(2)}", m.group(3))
    m = re.fullmatch(r"enc_p\.encoder\.norm_layers_([12])\.(\d+)\.(gamma|beta)",
                     name)
    if m:
        return (f"params/enc_p/encoder/norm{m.group(1)}_{m.group(2)}"
                f"/LayerNorm_0/{_norm_suffix(m.group(3))}", t_id)
    m = re.fullmatch(r"enc_p\.(out_proj|proj)\.(weight|bias)", name)
    if m:
        return _conv_entry(f"params/enc_p/{m.group(1)}", m.group(2))

    # ---- enc_q (PosteriorEncoder)
    m = re.fullmatch(r"enc_q\.(pre|proj)\.(weight|bias)", name)
    if m:
        return _conv_entry(f"params/enc_q/{m.group(1)}", m.group(2))
    if name.startswith("enc_q.enc."):
        return _wn(name[len("enc_q.enc."):], "params/enc_q/enc")

    # ---- flow (couplings at even indices; Flip has no params)
    m = re.fullmatch(r"flow\.flows\.(\d+)\.(.*)", name)
    if m:
        base = f"params/flow/flow_{int(m.group(1)) // 2}"
        rest = m.group(2)
        mm = re.fullmatch(r"(pre|post)\.(weight|bias)", rest)
        if mm:
            return _conv_entry(f"{base}/{mm.group(1)}", mm.group(2))
        if rest.startswith("enc."):
            return _wn(rest[4:], f"{base}/enc")
        return None

    # ---- dec (HiFi-GAN Generator)
    m = re.fullmatch(r"dec\.(conv_pre|conv_post|cond)\.(weight|bias)", name)
    if m:
        return _conv_entry(f"params/dec/{m.group(1)}", m.group(2))
    m = re.fullmatch(r"dec\.ups\.(\d+)\.(weight|bias)", name)
    if m:
        return (f"params/dec/ups_{m.group(1)}/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_conv if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"dec\.resblocks\.(\d+)\.(convs[12])\.(\d+)\.(weight|bias)",
                     name)
    if m:
        return _conv_entry(
            f"params/dec/resblocks_{m.group(1)}/{m.group(2)}_{m.group(3)}",
            m.group(4))

    # ---- GPT (UnifiedVoice)
    m = re.fullmatch(r"gpt\.(text|mel)_embedding\.weight", name)
    if m:
        return f"params/gpt/{m.group(1)}_embedding/embedding", t_id
    m = re.fullmatch(r"gpt\.(text|mel)_pos_embedding\.emb\.weight", name)
    if m:
        return f"params/gpt/{m.group(1)}_pos_embedding/embedding", t_id
    m = re.fullmatch(r"gpt\.final_norm\.(weight|bias)", name)
    if m:
        return f"params/gpt/final_norm/{_norm_suffix(m.group(1))}", t_id
    m = re.fullmatch(r"gpt\.(text|mel)_head\.(weight|bias)", name)
    if m:
        return (f"params/gpt/{m.group(1)}_head/dense/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_linear if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"gpt\.gpt\.ln_f\.(weight|bias)", name)
    if m:
        return f"params/gpt/gpt/ln_f/{_norm_suffix(m.group(1))}", t_id
    m = re.fullmatch(r"gpt\.gpt\.h\.(\d+)\.(ln_[12])\.(weight|bias)", name)
    if m:
        return (f"params/gpt/gpt/h_{m.group(1)}/{m.group(2)}/"
                f"{_norm_suffix(m.group(3))}", t_id)
    m = re.fullmatch(r"gpt\.gpt\.h\.(\d+)\.attn\.(c_attn|c_proj)"
                     r"\.(weight|bias)", name)
    if m:  # HF Conv1D: weight already (in, out)
        return (f"params/gpt/gpt/h_{m.group(1)}/attn/{m.group(2)}/dense/"
                + ("kernel" if m.group(3) == "weight" else "bias"), t_id)
    m = re.fullmatch(r"gpt\.gpt\.h\.(\d+)\.mlp\.(c_fc|c_proj)"
                     r"\.(weight|bias)", name)
    if m:
        return (f"params/gpt/gpt/h_{m.group(1)}/{m.group(2)}/dense/"
                + ("kernel" if m.group(3) == "weight" else "bias"), t_id)

    # ---- diffusion (DiffusionTts)
    if name == "diffusion.unconditioned_embedding":
        return "params/diffusion/unconditioned_embedding", lambda w: np.transpose(w, (0, 2, 1))
    m = re.fullmatch(r"diffusion\.(inp_block|integrating_conv)\.(weight|bias)",
                     name)
    if m:
        return _conv_entry(f"params/diffusion/{m.group(1)}", m.group(2))
    m = re.fullmatch(r"diffusion\.time_embed\.(0|2)\.(weight|bias)", name)
    if m:
        idx = "0" if m.group(1) == "0" else "1"
        return (f"params/diffusion/time_embed_{idx}/dense/"
                + ("kernel" if m.group(2) == "weight" else "bias"),
                t_linear if m.group(2) == "weight" else t_id)
    m = re.fullmatch(r"diffusion\.code_norm\.(weight|bias)", name)
    if m:
        return (f"params/diffusion/code_norm/GroupNorm_0/"
                f"{_norm_suffix(m.group(1))}", t_id)
    m = re.fullmatch(r"diffusion\.out\.(0|2)\.(weight|bias)", name)
    if m:
        if m.group(1) == "0":
            return (f"params/diffusion/out_norm/GroupNorm_0/"
                    f"{_norm_suffix(m.group(2))}", t_id)
        return _conv_entry("params/diffusion/out_conv", m.group(2))
    m = re.fullmatch(r"diffusion\.latent_conditioner\.(\d+)\.(.*)", name)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if idx == 0:  # the stride-1 conv
            mm = re.fullmatch(r"(weight|bias)", rest)
            return _conv_entry("params/diffusion/latent_conditioner_conv",
                               mm.group(1)) if mm else None
        return _diff_attn(rest, f"params/diffusion/latent_conditioner_{idx - 1}")
    m = re.fullmatch(r"diffusion\.contextual_embedder\.(\d+)\.(.*)", name)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if idx in (0, 1):
            mm = re.fullmatch(r"(weight|bias)", rest)
            return _conv_entry(
                f"params/diffusion/contextual_embedder_conv{idx}",
                mm.group(1)) if mm else None
        return _diff_attn(rest, f"params/diffusion/contextual_embedder_{idx - 2}")
    m = re.fullmatch(r"diffusion\.conditioning_timestep_integrator\.(\d+)"
                     r"\.(attn|resblk)\.(.*)", name)
    if m:
        base = f"params/diffusion/cond_integrator_{m.group(1)}"
        if m.group(2) == "attn":
            return _diff_attn(m.group(3), f"{base}/attn")
        return _diff_resblock(m.group(3), f"{base}/resblk")
    m = re.fullmatch(r"diffusion\.layers\.(\d+)\.(.*)", name)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if rest.startswith("attn."):
            return _diff_attn(rest[5:], f"params/diffusion/layer_{idx}/attn")
        if rest.startswith("resblk."):
            return _diff_resblock(rest[7:],
                                  f"params/diffusion/layer_{idx}/resblk")
        # plain trailing ResBlocks (indices >= num DiffusionLayers)
        return _diff_resblock(
            rest, f"params/diffusion/layer_res_{idx - diffusion_layers}")

    return None


def t_conv2d(w):  # torch Conv2d (out, in/g, kh, kw) -> flax (kh, kw, in/g, out)
    return np.transpose(w, (2, 3, 1, 0))


_DISC_PERIODS = (2, 3, 5, 7, 11)


def translate_discriminator(name: str) -> Optional[Tuple[str, Callable]]:
    """Reference ``MultiPeriodDiscriminator`` (D) state-dict name ->
    ('params/...' path, transform).

    Reference layout (vqvae/model_24k.py:407-431): ``discriminators.0`` is
    DiscriminatorS (1-D convs), ``discriminators.1..5`` are DiscriminatorP
    with periods (2,3,5,7,11) (2-D convs).  Checkpoints store D separately
    from G (train.py:139-150).
    """
    m = re.fullmatch(r"discriminators\.(\d)\.(convs\.(\d)|conv_post)"
                     r"\.(weight|bias)", name)
    if not m:
        return None
    idx = int(m.group(1))
    sub = "conv_post" if m.group(2) == "conv_post" else f"conv_{m.group(3)}"
    leaf = "kernel" if m.group(4) == "weight" else "bias"
    if idx == 0:  # DiscriminatorS: Conv1d wrapper nests an nn.Conv as 'conv'
        return (f"params/disc_s/{sub}/conv/{leaf}",
                t_conv if leaf == "kernel" else t_id)
    period = _DISC_PERIODS[idx - 1]
    return (f"params/disc_p{period}/{sub}/{leaf}",
            t_conv2d if leaf == "kernel" else t_id)


def convert_discriminator_state_dict(sd: Dict[str, Any], template: Dict[str, Any],
                                     weight_norm: str = "fold"
                                     ) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """torch D state dict -> the MPD ``params`` tree (pass the bare params
    subtree as ``template``, i.e. ``disc.init(...)['params']``).

    ``weight_norm``: 'fold' or 'reparam' (see convert_state_dict)."""
    import jax

    assert weight_norm in ("fold", "reparam"), weight_norm
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    if weight_norm == "fold":
        sd = fold_weight_norm(sd)
    converted: Dict[str, np.ndarray] = {}
    unmapped = []
    for name, value in sd.items():
        lookup = name
        wn_pair = (weight_norm == "reparam"
                   and name.endswith((".weight_v", ".weight_g")))
        if wn_pair:
            lookup = name[: -len(".weight_v")] + ".weight"
        tr = translate_discriminator(lookup)
        if tr is None:
            unmapped.append(name)
            continue
        path, fn = tr
        if wn_pair:
            path, value = _reparam_entry(name, path, fn, value)
            converted[path] = value
        else:
            converted[path] = fn(value)

    missing = []

    def fill(path, leaf):
        name = "params/" + "/".join(_k(k) for k in path)
        v = converted.pop(name, None)
        if v is None:
            missing.append(name)
            return leaf
        if tuple(v.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch at {name}: torch {v.shape} "
                             f"vs template {leaf.shape}")
        return np.asarray(v, dtype=leaf.dtype)

    params = jax.tree_util.tree_map_with_path(fill, template)
    report = {"unmapped": unmapped, "missing": missing,
              "unconsumed": sorted(converted)}
    return params, report


# ---------------------------------------------------------------------------
# State-dict level conversion
# ---------------------------------------------------------------------------


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Merge (weight_g, weight_v) pairs into plain weights."""
    out: Dict[str, np.ndarray] = {}
    for name, value in sd.items():
        if name.endswith(".weight_g"):
            continue
        if name.endswith(".weight_v"):
            base = name[: -len(".weight_v")]
            g = np.asarray(sd[base + ".weight_g"], np.float32)
            v = np.asarray(value, np.float32)
            norm = np.sqrt(np.sum(v ** 2, axis=tuple(range(1, v.ndim)),
                                  keepdims=True))
            out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
        else:
            out[name] = np.asarray(value)
    return out


def _reparam_entry(name: str, path: str, fn: Callable, value: np.ndarray):
    """Route a torch ``weight_{g,v}`` entry onto our ``g``/``v`` leaves.

    Our weight-norm layouts keep the normed channel axis LAST (see
    nn/common.py::_wn_norm), so torch weight_v transposes exactly like the
    plain weight and torch weight_g ((C,1,..) with torch dim=0) ravels to
    our per-channel (C,) vector.
    """
    if not path.endswith("/kernel"):
        raise ValueError(f"weight-normed entry {name} maps to non-kernel "
                         f"path {path}")
    base = path[: -len("kernel")]
    if name.endswith(".weight_v"):
        return base + "v", fn(value)
    return base + "g", np.asarray(value, np.float32).reshape(-1)


def convert_state_dict(sd: Dict[str, Any], template: Dict[str, Any],
                       diffusion_layers: int = 10,
                       weight_norm: str = "fold"
                       ) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """torch state dict -> variables matching ``template``'s structure.

    ``weight_norm``: 'fold' merges (weight_g, weight_v) into plain kernels
    (serving); 'reparam' keeps them as our (g, v) training parameterization —
    pass a template created under nn.common.weight_norm_reparam().

    Returns (variables, report) where report lists 'unmapped' reference names
    and 'missing' template paths that received no value.
    """
    import jax

    assert weight_norm in ("fold", "reparam"), weight_norm
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    if weight_norm == "fold":
        sd = fold_weight_norm(sd)
    converted: Dict[str, np.ndarray] = {}
    unmapped = []
    for name, value in sd.items():
        lookup = name
        wn_pair = (weight_norm == "reparam"
                   and name.endswith((".weight_v", ".weight_g")))
        if wn_pair:
            lookup = name[: -len(".weight_v")] + ".weight"
        tr = translate(lookup, diffusion_layers=diffusion_layers)
        if tr is None:
            if not any(name.startswith(p) for p in IGNORED):
                unmapped.append(name)
            continue
        path, fn = tr
        if wn_pair:
            path, v = _reparam_entry(name, path, fn, value)
        else:
            v = fn(value)
        if path.endswith("/inited"):
            v = np.asarray(v).reshape(()).astype(bool)
        converted[path] = v

    missing = []

    def fill(path, leaf):
        name = "/".join(_k(k) for k in path)
        v = converted.pop(name, None)
        if v is None:
            missing.append(name)
            return leaf
        if tuple(v.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch at {name}: torch {v.shape} "
                             f"vs template {leaf.shape}")
        return np.asarray(v, dtype=leaf.dtype)

    variables = jax.tree_util.tree_map_with_path(fill, template)
    report = {"unmapped": unmapped, "missing": missing,
              "unconsumed": sorted(converted)}
    return variables, report


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _k(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "name"):
        return str(k.name)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def load_torch_checkpoint(path: str, cfg, save_msgpack: Optional[str] = None,
                          allow_partial: bool = False, reparam: bool = False):
    """Load a reference ``model-*.pt`` and return serving variables.

    ``reparam=True`` keeps the torch weight-norm (g, v) parameterization
    (for resuming training under TrainConfig.weight_norm); default folds.

    Fails hard when template leaves received no checkpoint value unless
    ``allow_partial=True`` (silent random-init subtrees must be opted into —
    the reference's shape-tolerant loader at train.py:163-168 is deliberately
    NOT reproduced here; staged partial restore lives in
    train/checkpoint.py::restore_variables with an explicit skip report).
    """
    import jax
    import torch

    from detail_tts_tpu.models.synthesizer import SynthesizerTrn
    from detail_tts_tpu.train.step import init_variables

    data = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("G", "model"):
        if isinstance(data, dict) and key in data:
            data = data[key]
            break
    model = SynthesizerTrn(cfg)
    template = init_variables(model, cfg, jax.random.PRNGKey(0),
                              weight_norm=reparam)
    variables, report = convert_state_dict(
        data, template, diffusion_layers=cfg.diffusion.num_layers,
        weight_norm="reparam" if reparam else "fold")
    if report["unmapped"]:
        print(f"converter: {len(report['unmapped'])} unmapped entries "
              f"(first: {report['unmapped'][:5]})")
    if report["missing"]:
        msg = (f"converter: {len(report['missing'])} template leaves got no "
               f"checkpoint value (first: {report['missing'][:5]})")
        if not allow_partial:
            raise ValueError(msg + " — pass allow_partial=True to keep "
                             "initialised values for them")
        print(msg + " — kept initialised values (allow_partial)")
    if save_msgpack:
        from detail_tts_tpu.train.checkpoint import save_variables

        save_variables(save_msgpack, variables)
    return variables


def main(argv=None):
    """CLI: python -m detail_tts_tpu.io.torch_convert ckpt.pt out.msgpack"""
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to serving "
                    "weights (flax msgpack).")
    p.add_argument("torch_ckpt")
    p.add_argument("out_msgpack")
    p.add_argument("--config", default=None)
    p.add_argument("--allow-partial", action="store_true",
                   help="keep initialised values for template leaves absent "
                        "from the checkpoint (staged/partial models)")
    args = p.parse_args(argv)

    from detail_tts_tpu.config import Config

    cfg = Config.from_json(args.config) if args.config else Config()
    load_torch_checkpoint(args.torch_ckpt, cfg, save_msgpack=args.out_msgpack,
                          allow_partial=args.allow_partial)
    print(f"wrote {args.out_msgpack}")


if __name__ == "__main__":
    main()
