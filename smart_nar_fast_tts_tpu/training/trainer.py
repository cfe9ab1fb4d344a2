"""Training orchestration: the reference's ``train.py:21-196`` loop as a
restartable, multi-host-safe driver around the jitted step.

Structure per step (reference cadences, ``train.yaml:17-20``):
log every ``log_step``, synth-sample figure every ``synth_step``, val every
``val_step``, async checkpoint every ``save_step`` — plus NaN guards and
SIGTERM-triggered final save (preemption safety, SURVEY.md §5.3, which the
reference lacks entirely).
"""

from __future__ import annotations

import signal
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data.batch import Batch
from ..data.dataset import AcousticDataset, BucketBatcher
from ..models import FastSpeech2Align, FastSpeech2Loss
from ..parallel import batch_sharding, make_mesh
from .checkpoint import CheckpointManager
from .evaluate import evaluate
from .logging import MetricWriter, format_losses, plot_mel
from .profiling import StepProfiler, Throughput
from .schedule import make_optimizer
from .state import create_train_state
from .step import make_eval_step, make_multi_step, make_train_step


def _dispatch_groups(batch_iter, K: int):
    """Group consecutive same-bucket-shape batches into runs of ≤ K for
    multi-step dispatch; a shape change or epoch tail flushes early."""
    buf = []
    for item in batch_iter:
        if buf and (item[0].texts.shape != buf[-1][0].texts.shape
                    or item[0].mels.shape != buf[-1][0].mels.shape):
            yield buf
            buf = []
        buf.append(item)
        if len(buf) == K:
            yield buf
            buf = []
    if buf:
        yield buf


class Trainer:
    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        if cfg.preprocess.stats is None:
            raise ValueError(
                "PreprocessConfig.stats is required for training "
                "(load stats.json via Config loading helpers)")
        if mesh is None:
            # the data axis must divide the per-host batch; drop to the
            # largest divisor when batch < available data-parallel slots
            # (tiny debug configs).  Non-data axes (model/seq) keep their
            # configured sizes — an SP config's seq axis must never be
            # collapsed to fit a small batch.
            import math
            local_batch = (cfg.train.optimizer.batch_size
                           // jax.process_count())
            n_local = jax.local_device_count()
            tail = tuple(cfg.train.mesh_shape[1:])
            tail_size = int(np.prod(tail)) if tail else 1
            if n_local % tail_size:
                raise ValueError(
                    f"mesh_shape tail {tail} needs {tail_size} devices "
                    f"per data slot but only {n_local} are local")
            data_size = math.gcd(local_batch, n_local // tail_size)
            n_used = data_size * tail_size
            devices = (jax.devices()[:n_used * jax.process_count()]
                       if n_used < n_local else None)
            shape = ((-1,) + tail if devices is None
                     else (data_size,) + tail)
            mesh = make_mesh(shape, cfg.train.mesh_axis_names,
                             devices=devices)
        self.mesh = mesh
        # SP training wiring (VERDICT r4 Next #5): a model.yaml with
        # tpu.sequence_parallel=true trains with the decoder time axis
        # ring-sharded over cfg.model.sp_axis.  Hybrid DP×SP comes from a
        # 2-D train.yaml mesh, e.g. tpu.mesh_shape [2, 4] with
        # tpu.mesh_axis_names ["data", "seq"] and model tpu.sp_axis "seq";
        # the same mesh then carries batch-DP and the attention ring.
        self.sp_mesh = None
        if cfg.model.sequence_parallel:
            if cfg.model.sp_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"model.tpu.sp_axis={cfg.model.sp_axis!r} is not a "
                    f"mesh axis {self.mesh.axis_names}; set train.tpu."
                    "mesh_axis_names (e.g. ['data', 'seq']) to include it")
            self.sp_mesh = self.mesh
        self.model = FastSpeech2Align(cfg.model, cfg.preprocess)
        self.loss = FastSpeech2Loss(cfg.preprocess,
                                    guided_sigma=cfg.model.guided_sigma)
        self.tx = make_optimizer(cfg.train.optimizer,
                                 cfg.model.transformer.encoder_hidden)
        self.train_step = make_train_step(
            self.model, self.loss,
            grad_acc_steps=cfg.train.optimizer.grad_acc_step,
            mesh=self.mesh, sp_mesh=self.sp_mesh)
        self.eval_step = make_eval_step(self.model, self.loss,
                                        mesh=self.mesh,
                                        sp_mesh=self.sp_mesh)
        self.multi_step = None
        K = cfg.train.steps_per_dispatch
        if K > 1:
            sc = cfg.train.step
            for name in ("log_step", "synth_step", "val_step", "save_step"):
                if getattr(sc, name) % K:
                    raise ValueError(
                        f"{name}={getattr(sc, name)} must be a multiple "
                        f"of steps_per_dispatch={K}")
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .step import _trivial_mesh
            self.multi_step = make_multi_step(
                self.model, self.loss, num_steps=K,
                grad_acc_steps=cfg.train.optimizer.grad_acc_step,
                mesh=self.mesh, sp_mesh=self.sp_mesh)
            # None on 1-device meshes: committed NamedShardings cost extra
            # per-dispatch bookkeeping there for zero layout benefit
            self._multi_sharding = None if _trivial_mesh(self.mesh) else \
                NamedSharding(self.mesh, P(None, cfg.train.mesh_axis_names[0]))
        self._stop = False

        # jitted reconstruction forward for in-training sample figures
        # (VERDICT.md Weak #4: an eager model.apply here re-dispatched the
        # whole graph op-by-op every synth_step; jax.jit caches one compiled
        # program per bucket shape)
        def _recon(params, batch_stats, texts, src_lens, mels, mel_lens,
                   pitch, energy):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                texts, src_lens, mels=mels, mel_lens=mel_lens,
                p_targets=pitch, e_targets=energy, deterministic=True,
                sp_mesh=self.sp_mesh)
        self._recon_fwd = jax.jit(_recon)

        self._vocoder = None
        if cfg.train.vocoder_ckpt and jax.process_index() == 0:
            from ..vocoder import load_hifigan
            self._vocoder = load_hifigan(cfg.train.vocoder_ckpt)

    # -- data -------------------------------------------------------------
    def make_batcher(self, split: str,
                     pad_short: str = "repeat") -> BucketBatcher:
        c = self.cfg
        ds = AcousticDataset(split, c.preprocess)
        return BucketBatcher(
            ds, batch_size=c.train.optimizer.batch_size,
            text_buckets=c.train.text_buckets,
            mel_buckets=c.train.mel_buckets,
            seed=c.train.seed,
            host_id=jax.process_index(),
            num_hosts=jax.process_count(),
            pad_short=pad_short)

    # -- state ------------------------------------------------------------
    def init_state(self, rng_seed: Optional[int] = None):
        c = self.cfg
        seed = c.train.seed if rng_seed is None else rng_seed
        import jax.numpy as jnp
        L = c.train.text_buckets[0]
        T = c.train.mel_buckets[0]
        # init shapes don't affect param shapes, but a hybrid DP×SP init
        # runs through shard_map, whose batch dim must divide the data axis
        B = 2
        if self.sp_mesh is not None:
            B = max(B, dict(self.mesh.shape).get(
                c.train.mesh_axis_names[0], 1))
        variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((B, L), jnp.int32), jnp.full((B,), L, jnp.int32),
            mels=jnp.zeros((B, T, c.model.n_mel_channels)),
            mel_lens=jnp.full((B,), T, jnp.int32),
            p_targets=jnp.zeros((B, T)), e_targets=jnp.zeros((B, T)),
            # speakers must be present at init when multi_speaker, or the
            # speaker embedding is never created and the first training
            # apply fails with ScopeParamNotFoundError
            speakers=(jnp.zeros((B,), jnp.int32)
                      if c.model.multi_speaker else None),
            sp_mesh=self.sp_mesh)
        return create_train_state(variables, self.tx)

    # -- loop -------------------------------------------------------------
    def fit(self, total_steps: Optional[int] = None,
            restore: bool = True) -> None:
        c = self.cfg
        sc = c.train.step
        total = total_steps if total_steps is not None else sc.total_step

        state = self.init_state()
        ckpt = CheckpointManager(c.train.ckpt_path,
                                 save_interval_steps=sc.save_step)
        epoch, in_epoch = 0, 0
        if restore:
            state, data_state = ckpt.restore(state)
            if data_state:
                epoch = int(data_state.get("epoch", 0))
                in_epoch = int(data_state.get("in_epoch", 0))

        train_writer = MetricWriter(f"{c.train.log_path}/train")
        val_writer = MetricWriter(f"{c.train.log_path}/val")
        profiler = StepProfiler(c.train.log_path,
                                c.train.profile_start_step,
                                c.train.profile_num_steps)
        throughput = Throughput()
        train_batcher = self.make_batcher("train.txt")
        # masked (not repeated) short-batch padding: each val item counts
        # exactly once in the element-weighted averaging
        val_batcher = self.make_batcher("val.txt", pad_short="mask")
        rng = jax.random.PRNGKey(c.train.seed)
        from .step import _trivial_mesh
        sharding = None if _trivial_mesh(self.mesh) \
            else batch_sharding(self.mesh)

        def _on_sigterm(signum, frame):
            self._stop = True
        prev = signal.signal(signal.SIGTERM, _on_sigterm)

        step = int(np.asarray(state.step))
        K = max(1, self.cfg.train.steps_per_dispatch)

        def cadence(losses, batch, ids):
            if step % sc.log_step == 0:
                if not np.isfinite(float(losses.total)):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {losses}")
                train_writer.scalars(step, losses)
                rates = throughput.snapshot()
                if rates:
                    train_writer.scalar_dict(step, rates)
                train_writer.message(format_losses(step, total, losses))
            if step % sc.synth_step == 0:
                self._synth_sample(state, batch, ids, step, train_writer)
            if step % sc.val_step == 0:
                msg = evaluate(self.eval_step, state,
                               val_batcher.batches(0), step, total,
                               val_writer)
                val_writer.message(msg)
                # reference evaluate also synthesizes one val sample
                # (upstream semantics, SURVEY.md §3.5)
                vb = next(iter(val_batcher.batches(0)), None)
                if vb is not None:
                    self._synth_sample(state, vb[0], vb[1], step,
                                       val_writer)
            ckpt.save(state, {"epoch": epoch, "in_epoch": in_epoch})

        try:
            while step < total and not self._stop:
                done = False
                for group in _dispatch_groups(
                        train_batcher.batches(epoch, skip=in_epoch), K):
                    if len(group) == K and self.multi_step is not None:
                        # K optimizer steps in one compiled dispatch
                        stacked = Batch(*[
                            None if parts[0] is None else np.stack(parts)
                            for parts in zip(*(g[0] for g in group))])
                        stacked = jax.device_put(stacked,
                                                 self._multi_sharding)
                        state, losses_k = self.multi_step(state, stacked,
                                                          rng)
                        losses = jax.tree.map(lambda x: x[-1], losses_k)
                        step += K
                        in_epoch += K
                        profiler.step(step)
                        throughput.update(int(sum(
                            np.sum(np.asarray(g[0].mel_lens))
                            for g in group)))
                        cadence(losses, group[-1][0], group[-1][1])
                        done = step >= total or self._stop
                    else:
                        # single-step fallback (bucket-shape change or
                        # tail-of-epoch remainder)
                        for batch, ids, raws in group:
                            bd = jax.device_put(batch, sharding)
                            state, losses = self.train_step(state, bd, rng)
                            step += 1
                            in_epoch += 1
                            profiler.step(step)
                            throughput.update(int(np.sum(np.asarray(
                                batch.mel_lens))))
                            cadence(losses, batch, ids)
                            if step >= total or self._stop:
                                done = True
                                break
                    if done:
                        break
                if not done:     # epoch exhausted normally
                    epoch += 1
                    in_epoch = 0
            if ckpt.latest_step() != step:
                ckpt.save(state, {"epoch": epoch, "in_epoch": in_epoch},
                          force=True)
            ckpt.wait()
        finally:
            signal.signal(signal.SIGTERM, prev)
            profiler.close()
            ckpt.close()
            train_writer.close()
            val_writer.close()

    # -- sample synthesis during training ---------------------------------
    def _synth_sample(self, state, batch, ids, step, writer) -> None:
        """Reconstruction figure for the first batch item (reference
        ``utils/tools.py:96-150`` ``synth_one_sample``, sans vocoder)."""
        if not writer.enabled:
            return
        import jax.numpy as jnp
        # hybrid DP×SP shards the batch dim inside the ring's shard_map,
        # so the slice must stay divisible by the data axis; only item 0
        # is plotted either way
        nb = 1
        if self.sp_mesh is not None:
            nb = min(len(batch.texts), dict(self.mesh.shape).get(
                self.cfg.train.mesh_axis_names[0], 1))
        out = self._recon_fwd(
            state.params, state.batch_stats,
            jnp.asarray(batch.texts[:nb]), jnp.asarray(batch.src_lens[:nb]),
            jnp.asarray(batch.mels[:nb]), jnp.asarray(batch.mel_lens[:nb]),
            jnp.asarray(batch.pitch[:nb]), jnp.asarray(batch.energy[:nb]))
        n = int(batch.mel_lens[0])
        mel_pred = np.asarray(out.postnet_mel[0, :n]).T
        mel_true = np.asarray(batch.mels[0, :n]).T
        pitch = np.asarray(batch.pitch[0, :n])
        energy = np.asarray(batch.energy[0, :n])
        fig = plot_mel(
            [(mel_pred, pitch, energy), (mel_true, pitch, energy)],
            self.cfg.preprocess.stats,
            titles=[f"Synthesized ({ids[0]})", "Ground truth"])
        writer.figure(step, "Training/step_{}_{}".format(step, ids[0]), fig)
        import matplotlib.pyplot as plt
        plt.close(fig)
        if self._vocoder is not None:
            # reference synth_one_sample vocodes both reconstructed and GT
            # mels (utils/tools.py:108-132)
            from ..vocoder import hifigan_infer
            gen, variables = self._vocoder
            sr = self.cfg.preprocess.audio.sampling_rate
            for tag, mel in (("synthesized", mel_pred.T),
                             ("reconstructed_gt", mel_true.T)):
                wav = hifigan_infer(gen, variables, mel[None])[0]
                writer.audio(step, f"Training/step_{step}_{ids[0]}_{tag}",
                             np.asarray(wav), sr)
