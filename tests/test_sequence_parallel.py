"""Ring attention over an 8-device CPU mesh vs the full-attention oracle."""

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.models.layers import masked_softmax
from smart_nar_fast_tts_tpu.parallel.mesh import make_mesh
from smart_nar_fast_tts_tpu.parallel.sequence import (
    sequence_parallel_self_attention)


def _oracle(q, k, v, valid):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    p = masked_softmax(scores, valid[:, None, None, :])
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


class TestRingAttention:
    def _data(self, B=2, H=2, T=64, D=16, seed=0):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
        lens = rng.randint(T // 2, T + 1, size=B)
        valid = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
        return q, k, v, valid

    def test_matches_full_attention(self):
        mesh = make_mesh((8,), ("data",))
        q, k, v, valid = self._data()
        ref = _oracle(q, k, v, valid)
        out = sequence_parallel_self_attention(mesh, q, k, v, valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_ragged_valid_lengths(self):
        # valid boundary inside an interior shard
        mesh = make_mesh((8,), ("data",))
        q, k, v, _ = self._data(B=1, T=64, seed=1)
        valid = jnp.asarray(np.arange(64)[None, :] < 23)
        ref = _oracle(q, k, v, valid)
        out = sequence_parallel_self_attention(mesh, q, k, v, valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_no_valid_keys_zero_rows(self):
        mesh = make_mesh((8,), ("data",))
        q, k, v, _ = self._data(B=1, T=64, seed=2)
        valid = jnp.zeros((1, 64), bool)
        out = sequence_parallel_self_attention(mesh, q, k, v, valid)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_jit_compiles(self):
        mesh = make_mesh((8,), ("data",))
        q, k, v, valid = self._data(seed=3)

        @jax.jit
        def f(q, k, v, valid):
            return sequence_parallel_self_attention(mesh, q, k, v, valid)

        out = f(q, k, v, valid)
        ref = _oracle(q, k, v, valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
