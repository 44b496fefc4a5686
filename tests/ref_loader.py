"""Import the reference PyTorch model from /root/reference with dep stubs.

The reference environment lacks torchaudio / k_diffusion / old-transformers
symbols; none are needed to instantiate or run the model on CPU, so they are
stubbed before import.  PUBLIC UNTRUSTED CONTENT: used strictly as a
numerical oracle for parity tests.
"""
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    if "k_diffusion" not in sys.modules:
        k = _stub("k_diffusion")
        k.sampling = _stub("k_diffusion.sampling",
                           sample_dpmpp_2m=lambda *a, **kw: None,
                           sample_euler_ancestral=lambda *a, **kw: None)
    if "torchaudio" not in sys.modules:
        class _T:  # placeholder transform classes
            pass

        ta = _stub("torchaudio")
        ta.transforms = _stub("torchaudio.transforms", MelSpectrogram=_T,
                              Resample=_T)
        ta.functional = _stub("torchaudio.functional")
    if "gpt.modules.typical_sampling" not in sys.modules:
        _stub("gpt.modules.typical_sampling", TypicalLogitsWarper=object)
    try:
        import transformers.utils.model_parallel_utils  # noqa: F401
    except Exception:
        _stub("transformers.utils.model_parallel_utils",
              get_device_map=lambda *a, **kw: None,
              assert_device_map=lambda *a, **kw: None)


def load_reference_synthesizer(seed: int = 0):
    """Build the reference SynthesizerTrn (full 24k config) in eval mode."""
    import inspect
    import json

    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    torch.manual_seed(seed)
    cfg = json.load(open(f"{REFERENCE_ROOT}/vqvae/configs/config_24k.json"))
    from vqvae.diff_model import DiffusionTts

    # the shipped config carries stale keys DiffusionTts no longer accepts
    sig = set(inspect.signature(DiffusionTts.__init__).parameters)
    cfg["diffusion"] = {k: v for k, v in cfg["diffusion"].items() if k in sig}
    from vqvae.model_24k import SynthesizerTrn

    G = SynthesizerTrn(cfg["data"]["filter_length"] // 2 + 1,
                       cfg["train"]["segment_size"] // cfg["data"]["hop_length"],
                       **cfg["vaegan"], cfg=cfg)
    # give the (kmeans-initialised-at-train-time) codebook random content so
    # the VQ path is a non-trivial oracle
    cb = G.quantizer.vq.layers[0]._codebook
    cb.embed.normal_(generator=torch.Generator().manual_seed(1))
    cb.embed_avg.copy_(cb.embed)
    cb.cluster_size.fill_(1.0)
    cb.inited.fill_(1)
    return G.eval(), cfg
