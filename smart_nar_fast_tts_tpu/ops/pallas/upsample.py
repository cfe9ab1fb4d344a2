"""Banded Gaussian upsampling kernel.

The dense oracle (``ops/upsample.py:gaussian_upsample``, from the reference's
unwired ``model/modules.py:162-192``) materializes the full (B, L, T) weight
tensor in HBM.  With σ = 10 frames the weights are numerically zero beyond a
few σ of each phoneme's center, so the matrix is band-diagonal (SURVEY.md
§5.7): this kernel streams phoneme blocks, computes the Gaussian weights in
VMEM, fuses the normalization, and **skips** phoneme blocks whose centers lie
entirely outside the current frame block's band — O(L + T·band) work instead
of O(L·T), and no (B, L, T) HBM traffic.

Band default 6σ: exp(−36) ≈ 2e−16, full fp32 parity with the dense oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(cmin_ref, cmax_ref, x_ref, c_ref, valid_ref, o_ref, *,
                   block_l: int, block_t: int, inv_sigma2: float,
                   band: float):
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_lb = x_ref.shape[1] // block_l
    D = x_ref.shape[-1]

    t0 = (tb * block_t).astype(jnp.float32)
    # Mosaic iota must be integer-typed; cast after
    t = t0 + jax.lax.broadcasted_iota(
        jnp.int32, (block_l, block_t), 1).astype(jnp.float32)

    def body(lb, carry):
        num, den = carry
        lo = cmin_ref[b, lb] - band
        hi = cmax_ref[b, lb] + band
        t_lo = t0
        t_hi = t0 + (block_t - 1)

        def accumulate(carry):
            num, den = carry
            c_blk = c_ref[0, pl.ds(lb * block_l, block_l), :]     # (bl, 1)
            v_blk = valid_ref[0, pl.ds(lb * block_l, block_l), :]
            x_blk = x_ref[0, pl.ds(lb * block_l, block_l), :]     # (bl, D)
            dist2 = (t - c_blk) ** 2                              # (bl, bt)
            w = jnp.exp(-inv_sigma2 * dist2) * v_blk
            ones = jnp.ones((w.shape[0], 1), jnp.float32)
            # HIGHEST: keep f32-faithful output under the default f32
            # compute policy (plain MXU dots would bf16-round w·x)
            den = den + jax.lax.dot_general(
                w, ones, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)               # (bt, 1)
            num = num + jax.lax.dot_general(
                w, x_blk.astype(jnp.float32), (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)               # (bt, D)
            return num, den

        return jax.lax.cond(
            jnp.logical_and(hi >= t_lo, lo <= t_hi),
            accumulate, lambda c: c, carry)

    num = jnp.zeros((block_t, D), jnp.float32)
    den = jnp.zeros((block_t, 1), jnp.float32)
    num, den = jax.lax.fori_loop(0, n_lb, body, (num, den))
    o_ref[0] = (num / (den + 1e-20)).astype(o_ref.dtype)


def gaussian_upsample_banded(x: jnp.ndarray, durations: jnp.ndarray,
                             max_len: int, phon_valid: jnp.ndarray,
                             sigma: float = 10.0, block_l: int = 128,
                             block_t: int = 256, band_sigmas: float = 6.0,
                             interpret: bool = False
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``ops.upsample.gaussian_upsample`` minus the returned
    weight matrix (never consumed by the model).

    Args match the oracle: x (B, L, D), durations (B, L), phon_valid (B, L)
    float {0,1}; returns (out (B, T, D), mel_len (B,)).  Differentiable:
    the backward pass recomputes through the dense oracle.
    """
    d = durations.astype(jnp.float32) * phon_valid
    total = jnp.sum(d, axis=1)
    mel_len = jnp.minimum(total, max_len).astype(jnp.int32)
    out = _banded_out(x, durations, phon_valid, max_len, sigma, block_l,
                      block_t, band_sigmas, interpret)
    return out, mel_len


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _banded_out(x, durations, phon_valid, max_len, sigma, block_l, block_t,
                band_sigmas, interpret):
    return _banded_forward(x, durations, phon_valid, max_len, sigma,
                           block_l, block_t, band_sigmas, interpret)


def _banded_fwd(x, durations, phon_valid, max_len, sigma, block_l, block_t,
                band_sigmas, interpret):
    out = _banded_forward(x, durations, phon_valid, max_len, sigma,
                          block_l, block_t, band_sigmas, interpret)
    return out, (x, durations, phon_valid)


def _banded_bwd(max_len, sigma, block_l, block_t, band_sigmas, interpret,
                res, g):
    from ..upsample import gaussian_upsample
    x, durations, phon_valid = res
    _, vjp = jax.vjp(
        lambda x, d, v: gaussian_upsample(x, d, max_len, v, sigma=sigma)[0],
        x, durations, phon_valid)
    return vjp(g)


_banded_out.defvjp(_banded_fwd, _banded_bwd)


def _banded_forward(x: jnp.ndarray, durations: jnp.ndarray,
                    phon_valid: jnp.ndarray, max_len: int, sigma: float,
                    block_l: int, block_t: int, band_sigmas: float,
                    interpret: bool) -> jnp.ndarray:
    B, L, D = x.shape
    d = durations.astype(jnp.float32) * phon_valid
    e = jnp.cumsum(d, axis=1)
    c = e - 0.5 * d                                               # (B, L)
    total = e[:, -1]

    L_p = -(-L // block_l) * block_l
    T_p = -(-max_len // block_t) * block_t
    xp = jnp.pad(x, ((0, 0), (0, L_p - L), (0, 0)))
    cp = jnp.pad(c, ((0, 0), (0, L_p - L)))
    vp = jnp.pad(phon_valid.astype(jnp.float32), ((0, 0), (0, L_p - L)))

    # per-(batch, phoneme-block) center ranges over *valid* phonemes, for
    # the band-skip test (fully padded blocks get an empty range)
    n_lb = L_p // block_l
    c_blk = cp.reshape(B, n_lb, block_l)
    v_blk = vp.reshape(B, n_lb, block_l) > 0
    cmin = jnp.min(jnp.where(v_blk, c_blk, jnp.inf), axis=-1)     # (B, n_lb)
    cmax = jnp.max(jnp.where(v_blk, c_blk, -jnp.inf), axis=-1)

    out = pl.pallas_call(
        functools.partial(_banded_kernel, block_l=block_l, block_t=block_t,
                          inv_sigma2=float(sigma) ** -2,
                          band=float(band_sigmas) * float(sigma)),
        out_shape=jax.ShapeDtypeStruct((B, T_p, D), x.dtype),
        grid=(B, T_p // block_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # cmin
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # cmax
            pl.BlockSpec((1, L_p, D), lambda b, t: (b, 0, 0)),     # x
            pl.BlockSpec((1, L_p, 1), lambda b, t: (b, 0, 0)),     # centers
            pl.BlockSpec((1, L_p, 1), lambda b, t: (b, 0, 0)),     # valid
        ],
        out_specs=pl.BlockSpec((1, block_t, D), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(cmin, cmax, xp, cp[..., None], vp[..., None])

    out = out[:, :max_len, :]
    t_idx = jnp.arange(max_len, dtype=jnp.float32)
    frame_valid = t_idx[None, :] < total[:, None]
    return jnp.where(frame_valid[:, :, None], out, 0.0)
