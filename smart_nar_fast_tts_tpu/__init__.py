"""TPU-native non-autoregressive TTS framework (FastSpeech2-align family).

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
SMART-TTS/SMART-NAR_Fast_TTS reference (FastSpeech2 with learned alignment:
reference mel encoder + linguistic/acoustic cross-attention + on-the-fly
duration extraction + Gaussian upsampling), built for TPU hardware:

- static-shape, mask-driven compute (no data-dependent Python loops),
- batched MXU-friendly matmuls (Gaussian upsampling as a matmul, vectorized
  duration extraction),
- SPMD parallelism over a ``jax.sharding.Mesh`` (data/model axes) instead of
  single-process DataParallel,
- Pallas kernels for the hot ops (fused STFT, alignment attention, banded
  upsampling, vocoder convs).

Package layout:
    config    — typed configuration (mirrors the reference 3-YAML triplet)
    text      — text frontend: symbols, cleaners, numbers, g2p
    audio     — DSP: STFT/mel features, Griffin-Lim
    ops       — core numeric ops (masks, upsampling, durations) and the
                Pallas TPU kernels (ops.pallas)
    models    — acoustic model (FastSpeech2Align), losses, torch converter
    vocoder   — HiFi-GAN / MelGAN generators, discriminators, GAN losses
    data      — offline preprocessor + bucketed input pipeline + native F0
    parallel  — mesh/sharding helpers, ring (sequence-parallel) attention
    training  — optimizer, train/eval/GAN loops, checkpointing, profiling
    cli       — preprocess / train / synthesize / evaluate /
                train_vocoder / import_checkpoint entry points
"""

__version__ = "0.1.0"
