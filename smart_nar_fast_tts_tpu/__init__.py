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
    text      — text frontend: symbols, cleaners, g2p
    audio     — DSP: STFT/mel features, Griffin-Lim
    ops       — core numeric ops: masks, attention, upsampling, durations
    models    — acoustic model, losses, vocoders
    data      — offline preprocessor + bucketed input pipeline
    parallel  — mesh/sharding/partitioning helpers
    training  — optimizer, train/eval loops, checkpointing
    utils     — logging, plotting, misc host-side tools
"""

__version__ = "0.1.0"
