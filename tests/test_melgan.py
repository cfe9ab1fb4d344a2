"""MelGAN generator: torch-oracle parity + import + inverse API.

Oracle: the descript/melgan-neurips generator topology reconstructed in
torch with weight_norm (the exact torch.hub checkpoint format the reference
loads at ``utils/model.py:42-52``).
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.vocoder.melgan import (
    MelGANConfig, MelGANGenerator, melgan_inverse, melgan_torch_to_flax)

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

TINY = MelGANConfig(n_mels=8, ngf=4, n_residual_layers=2, ratios=(4, 2))


def _torch_generator(cfg: MelGANConfig):
    """descript melgan Generator, construction order preserved."""

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(dilation),
                weight_norm(nn.Conv1d(dim, dim, 3, dilation=dilation)),
                nn.LeakyReLU(0.2),
                weight_norm(nn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = 2 ** len(cfg.ratios)
    model = [nn.ReflectionPad1d(3),
             weight_norm(nn.Conv1d(cfg.n_mels, mult * cfg.ngf, 7))]
    for r in cfg.ratios:
        model += [nn.LeakyReLU(0.2),
                  weight_norm(nn.ConvTranspose1d(
                      mult * cfg.ngf, mult * cfg.ngf // 2, r * 2, stride=r,
                      padding=r // 2 + r % 2, output_padding=r % 2))]
        for j in range(cfg.n_residual_layers):
            model += [ResnetBlock(mult * cfg.ngf // 2, dilation=3 ** j)]
        mult //= 2
    model += [nn.LeakyReLU(0.2), nn.ReflectionPad1d(3),
              weight_norm(nn.Conv1d(cfg.ngf, 1, 7)), nn.Tanh()]

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*model)

        def forward(self, mel):
            return self.model(mel)

    g = G()
    torch.manual_seed(0)
    for p in g.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.1)
    return g


class TestMelGAN:
    def test_torch_parity(self):
        cfg = TINY
        oracle = _torch_generator(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        variables = melgan_torch_to_flax(sd, cfg)
        gen = MelGANGenerator(cfg)

        rng = np.random.RandomState(0)
        mel = rng.randn(2, 8, 17).astype(np.float32)       # (B, n_mels, T)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(mel)).numpy()[:, 0, :]
        got = gen.apply(variables, jnp.swapaxes(jnp.asarray(mel), 1, 2))
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5,
                                   rtol=1e-4)

    def test_output_length_is_t_times_hop(self):
        gen = MelGANGenerator(TINY)
        mel = jnp.zeros((1, 12, TINY.n_mels))
        variables = gen.init(jax.random.PRNGKey(0), mel)
        wav = gen.apply(variables, mel)
        assert wav.shape == (1, 12 * TINY.hop_length)

    def test_odd_ratio_rejected(self):
        cfg = MelGANConfig(n_mels=8, ngf=4, n_residual_layers=1,
                           ratios=(3, 2))
        gen = MelGANGenerator(cfg)
        with pytest.raises(ValueError, match="even ratios"):
            gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 8)))

    def test_inverse_api_scaling_and_trim(self):
        gen = MelGANGenerator(TINY)
        mel = jnp.zeros((2, 10, TINY.n_mels))
        variables = gen.init(jax.random.PRNGKey(1), mel)
        # natural-log mels in; inverse divides by ln(10) and trims
        wavs = melgan_inverse(gen, variables, mel,
                              mel_lens=np.asarray([10, 4]))
        assert len(wavs) == 2
        assert wavs[0].shape == (10 * TINY.hop_length,)
        assert wavs[1].shape == (4 * TINY.hop_length,)
        assert np.max(np.abs(wavs[0])) <= 32768.0
