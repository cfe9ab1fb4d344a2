"""HiFi-GAN generator: torch-oracle parity, weight-norm folding, shapes.

The reference ships no hifigan source (broken symlink, SURVEY.md §0.1), so
the oracle here is a minimal torch generator constructed from the documented
V1 topology (SURVEY.md §2.6 #5) with torch weight_norm — exactly the
checkpoint format the importer must consume.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU jax before import)
import jax.numpy as jnp

from smart_nar_fast_tts_tpu.vocoder import (
    HiFiGANConfig, HiFiGANGenerator, fold_weight_norm, hifigan_infer,
    torch_to_flax)

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

LRELU = 0.1


class _TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dil=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                  padding=(k - 1) * d // 2)) for d in dil])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dil])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = torch.nn.functional.leaky_relu(x, LRELU)
            xt = c1(xt)
            xt = torch.nn.functional.leaky_relu(xt, LRELU)
            xt = c2(xt)
            x = x + xt
        return x


class _TorchGenerator(nn.Module):
    """Documented V1 topology with weight_norm (the import format)."""

    def __init__(self, cfg: HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = weight_norm(
            nn.Conv1d(cfg.n_mels, cfg.upsample_initial_channel, 7,
                      padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            cin = cfg.upsample_initial_channel // (2 ** i)
            cout = cin // 2
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(cfg.resblock_kernel_sizes,
                              cfg.resblock_dilation_sizes):
                self.resblocks.append(_TorchResBlock1(cout, rk, tuple(rd)))
        self.conv_post = weight_norm(nn.Conv1d(cout, 1, 7, padding=3))

    def forward(self, mel):
        nk = len(self.cfg.resblock_kernel_sizes)
        x = self.conv_pre(mel)
        for i in range(len(self.ups)):
            x = torch.nn.functional.leaky_relu(x, LRELU)
            x = self.ups[i](x)
            xs = None
            for j in range(nk):
                y = self.resblocks[i * nk + j](x)
                xs = y if xs is None else xs + y
            x = xs / nk
        x = torch.nn.functional.leaky_relu(x)   # default slope 0.01
        return torch.tanh(self.conv_post(x))


SMALL = HiFiGANConfig(upsample_initial_channel=32, n_mels=8)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    ref = _TorchGenerator(SMALL).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return ref, sd


def test_generator_parity(oracle):
    """Imported weight-normed torch checkpoint → identical waveform."""
    ref, sd = oracle
    gen = HiFiGANGenerator(SMALL)
    variables = {"params": torch_to_flax(sd, SMALL)}

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 8, 23)).astype(np.float32)  # (B, C, T)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()[:, 0]       # (B, T*256)
    got = gen.apply(variables, jnp.asarray(mel.transpose(0, 2, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fold_matches_remove_weight_norm(oracle):
    ref, sd = oracle
    folded = fold_weight_norm(sd)
    for m in ref.modules():
        if isinstance(m, (nn.Conv1d, nn.ConvTranspose1d)):
            torch.nn.utils.remove_weight_norm(m)
    for k, v in ref.state_dict().items():
        np.testing.assert_allclose(folded[k], v.detach().numpy(),
                                   atol=1e-6, err_msg=k)


def test_output_length_is_hop_times_frames():
    cfg = HiFiGANConfig(upsample_initial_channel=16, n_mels=4)
    gen = HiFiGANGenerator(cfg)
    import jax
    mel = jnp.zeros((1, 17, 4))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert cfg.hop_length == 256
    assert wav.shape == (1, 17 * 256)


def test_hifigan_infer_trims_and_scales():
    cfg = HiFiGANConfig(upsample_initial_channel=16, n_mels=4)
    gen = HiFiGANGenerator(cfg)
    import jax
    mel = jnp.zeros((2, 10, 4))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wavs = hifigan_infer(gen, variables, mel, mel_lens=[10, 6])
    assert len(wavs[0]) == 10 * 256 and len(wavs[1]) == 6 * 256
    assert np.max(np.abs(wavs[0])) <= 32768.0


def test_infer_reuses_one_jit_wrapper():
    # repeated hifigan_infer calls must hit the same compiled program:
    # a fresh jax.jit(generator.apply) per call would re-trace every time
    from smart_nar_fast_tts_tpu.vocoder.hifigan import _cached_apply
    cfg = HiFiGANConfig(upsample_initial_channel=16, n_mels=4)
    gen = HiFiGANGenerator(cfg)
    import jax
    mel = jnp.zeros((1, 8, 4))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    hifigan_infer(gen, variables, mel)
    wrapper = _cached_apply(gen)
    hifigan_infer(gen, variables, mel)
    assert _cached_apply(HiFiGANGenerator(cfg)) is wrapper  # config-keyed


def test_from_dict_json_lists_stay_hashable():
    cfg = HiFiGANConfig.from_dict({
        "resblock": "1", "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 512,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "num_mels": 80, "sampling_rate": 22050})
    assert cfg == HiFiGANConfig()
    hash(cfg)  # lru_cache on _cached_apply requires this


def test_resblock2_variant():
    cfg = HiFiGANConfig(resblock="2", upsample_initial_channel=16,
                        n_mels=4, resblock_kernel_sizes=(3, 5),
                        resblock_dilation_sizes=((1, 2), (2, 6)),
                        upsample_rates=(8, 8, 4),
                        upsample_kernel_sizes=(16, 16, 8))
    gen = HiFiGANGenerator(cfg)
    import jax
    mel = jnp.zeros((1, 9, 4))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (1, 9 * 256)


def test_v1_param_count():
    """Full-size V1 must land at the documented ~13.9M params."""
    import jax
    gen = HiFiGANGenerator(HiFiGANConfig())
    variables = jax.eval_shape(
        lambda: gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80))))
    n = sum(int(np.prod(x.shape))
            for x in jax.tree.leaves(variables["params"]))
    assert 13.8e6 < n < 14.1e6, n


def test_direct_list_construction_stays_hashable():
    # HiFiGANConfig built with Python lists (not via from_dict) must still
    # be hashable: hifigan_infer's lru_cache hashes the generator config
    cfg = HiFiGANConfig(upsample_rates=[8, 8, 2, 2],
                        upsample_kernel_sizes=[16, 16, 4, 4],
                        resblock_kernel_sizes=[3, 7, 11],
                        resblock_dilation_sizes=[[1, 3, 5]] * 3)
    assert cfg == HiFiGANConfig()
    hash(cfg)


def test_bfloat16_compute_path(oracle):
    """compute_dtype='bfloat16' (reachable via from_dict) must track the
    f32 forward closely — params stay f32, conv stack runs bf16."""
    _, sd = oracle
    d = {"upsample_initial_channel": 32, "num_mels": 8,
         "compute_dtype": "bfloat16"}
    cfg = HiFiGANConfig.from_dict(d)
    assert cfg.compute_dtype == "bfloat16"
    gen16 = HiFiGANGenerator(cfg)
    gen32 = HiFiGANGenerator(SMALL)
    variables = {"params": torch_to_flax(sd, SMALL)}

    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((2, 23, 8)), jnp.float32)
    w32 = np.asarray(gen32.apply(variables, mel))
    w16 = np.asarray(gen16.apply(variables, mel))
    assert w16.dtype == np.float32          # final conv+tanh stay f32
    rel = np.abs(w16 - w32).mean() / (np.abs(w32).mean() + 1e-9)
    assert rel < 0.08, rel


def test_tensor_parallel_v1_full_topology():
    """VERDICT.md Weak #5: TP must be exercised at real V1 scale (512→32
    channels, 13.9M params) — a layout/divisibility bug at scale would
    slip through the toy-sized test below."""
    import jax
    from smart_nar_fast_tts_tpu.parallel.mesh import make_mesh
    from smart_nar_fast_tts_tpu.vocoder.sharding import shard_hifigan

    cfg = HiFiGANConfig()                    # real V1: 512ch, 80 mels
    gen = HiFiGANGenerator(cfg)
    mel = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, 7, 80)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(2), mel)
    want = gen.apply(variables, mel)

    mesh = make_mesh((1, 8), ("data", "model"))
    forward = shard_hifigan(gen, variables, mesh)
    got = forward(mel)
    assert got.shape == (1, 7 * 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_tensor_parallel_matches_single_device():
    """Channel-sharded (TP) vocoder on a 2×4 data×model mesh produces the
    same waveform as the unsharded forward."""
    import jax
    from smart_nar_fast_tts_tpu.parallel.mesh import make_mesh
    from smart_nar_fast_tts_tpu.vocoder.sharding import shard_hifigan

    cfg = HiFiGANConfig(upsample_initial_channel=64, n_mels=8)
    gen = HiFiGANGenerator(cfg)
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 11, 8)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    want = gen.apply(variables, mel)

    mesh = make_mesh((2, 4), ("data", "model"))
    forward = shard_hifigan(gen, variables, mesh)
    got = forward(mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


class TestGroupedTail:
    """``tail_impl='grouped'`` (round-5, VERDICT r4 Next #1): the
    space-to-depth lowering of the low-channel tail must be the identical
    function — same parameter tree, same output — as the plain path.

    Exactness is checked under ``jax.default_matmul_precision('highest')``
    because the *default* conv precision is bf16-class (the TPU MXU
    contract): two different-but-exact lowerings then differ by bf16
    rounding noise, which is a property of the arithmetic, not the
    lowering (verified against an f64 oracle during development: plain
    and grouped sit at the SAME distance from the true function)."""

    def _pair(self, **kw):
        import dataclasses
        cfg = HiFiGANConfig(**kw)
        return (HiFiGANGenerator(cfg),
                HiFiGANGenerator(dataclasses.replace(
                    cfg, tail_impl="grouped")))

    def test_identical_param_tree(self):
        import jax
        gen, gen_g = self._pair(
            upsample_rates=(8, 2, 2), upsample_kernel_sizes=(16, 4, 4),
            upsample_initial_channel=64, resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3)
        mel = jnp.asarray(np.random.RandomState(0).randn(2, 24, 80),
                          jnp.float32)
        v = gen.init(jax.random.PRNGKey(0), mel)
        vg = gen_g.init(jax.random.PRNGKey(0), mel)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vg))
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vg)):
            assert a.shape == b.shape

    def test_matches_plain_exactly_at_high_precision(self):
        import jax
        gen, gen_g = self._pair(
            upsample_rates=(8, 2, 2), upsample_kernel_sizes=(16, 4, 4),
            upsample_initial_channel=64, resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3)
        mel = jnp.asarray(np.random.RandomState(0).randn(2, 24, 80),
                          jnp.float32)
        v = gen.init(jax.random.PRNGKey(0), mel)
        with jax.default_matmul_precision("highest"):
            ya = gen.apply(v, mel)
            yb = gen_g.apply(v, mel)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   atol=1e-6)

    def test_full_v1_topology(self):
        import jax
        gen, gen_g = self._pair()          # real V1: 512→32, rates 8822
        mel = jnp.asarray(np.random.RandomState(1).randn(1, 6, 80),
                          jnp.float32)
        v = gen.init(jax.random.PRNGKey(1), mel)
        with jax.default_matmul_precision("highest"):
            ya = gen.apply(v, mel)
            yb = gen_g.apply(v, mel)
        assert ya.shape == yb.shape == (1, 6 * 256)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   atol=1e-6)

    def test_torch_oracle_parity(self, oracle):
        """Grouped path against the torch V1 oracle — same tolerance the
        plain path's parity test uses."""
        import dataclasses
        import jax
        ref, sd = oracle
        gen = HiFiGANGenerator(dataclasses.replace(SMALL,
                                                   tail_impl="grouped"))
        variables = {"params": torch_to_flax(sd, SMALL)}
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((2, 8, 23)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(mel)).numpy()[:, 0]
        with jax.default_matmul_precision("highest"):
            got = gen.apply(variables,
                            jnp.asarray(mel.transpose(0, 2, 1)))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_grad_flows_through_grouped(self):
        """GAN training uses the generator forward; the block-banded
        kernel assembly is linear in the params so grads must match the
        plain path."""
        import jax
        gen, gen_g = self._pair(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 2),))
        mel = jnp.asarray(np.random.RandomState(2).randn(1, 16, 80),
                          jnp.float32)
        v = gen.init(jax.random.PRNGKey(2), mel)

        def loss(params, g):
            return jnp.sum(g.apply({"params": params}, mel) ** 2)

        with jax.default_matmul_precision("highest"):
            ga = jax.grad(loss)(v["params"], gen)
            gb = jax.grad(loss)(v["params"], gen_g)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
