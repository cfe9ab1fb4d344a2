"""Core numeric ops: masks, positional encodings, attention, length
mapping (upsampling), duration extraction — all static-shape, batched,
XLA-friendly. Pallas TPU kernels live in ``ops.pallas``."""
