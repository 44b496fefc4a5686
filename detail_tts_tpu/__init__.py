"""detail_tts_tpu: TPU-native zero-shot voice-cloning TTS framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
detail_tts system (see SURVEY.md): mel VQ-VAE, GPT acoustic decoder,
diffusion refiner, flow-VAE and HiFi-GAN vocoder, plus staged training,
serving, and data tooling.
"""
from detail_tts_tpu.config import Config  # noqa: F401

__version__ = "0.1.0"
