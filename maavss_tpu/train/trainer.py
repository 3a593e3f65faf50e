"""Trainer: one loop reproducing every reference training script's behavior.

The reference has 9 near-copy train scripts (SURVEY.md §2.1); each becomes a
(step_fn, mode_schedule, checkpoint_policy) configuration of this single
Trainer:

- epoch x steps_per_epoch loop over an (infinite) host batch iterator,
- modality-curriculum schedule: 'cycle' increments mode 0→1→2 every
  `mode_freq` epochs (train.py:239-241); 'random01' draws mode ∈ {0,1}
  (train_avse_frames.py:219-220 — the reference's randint(0,2) excludes AV
  mode, a quirk preserved under its own name); 'fixed' pins one mode,
- per-step metrics to JSONL (+ optional wandb) with the reference's metric
  names, plus the clips/sec/chip meter (the benchmark metric),
- checkpoint policies: 'epoch' (train_avse_frames.py:222-226), 'best' val
  loss (train_av_net.py:174-181), every-N-steps via cfg.cp_freq
  (train_audio_net.py:128-134); auto-resume via cfg.c / cfg.checkpoint.

Because `mode` is a traced argument of the compiled step, curriculum switches
never recompile; the host loop is bookkeeping only.
"""

from __future__ import annotations

import dataclasses
import os
import signal
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maavss_tpu.config import RunConfig
from maavss_tpu.exp.checkpoint import load_checkpoint, save_checkpoint
from maavss_tpu.exp.metrics import Meter, MetricsLogger
from maavss_tpu.train.state import TrainState


class Trainer:
    def __init__(
        self,
        cfg: RunConfig,
        step_fn: Callable,
        state: TrainState,
        run_name: str = "run",
        eval_fn: Optional[Callable] = None,
        mode_schedule: str = "cycle",  # cycle | random01 | fixed
        fixed_mode: int = 2,
        checkpoint_policy: str = "epoch",  # epoch | best | none
        n_chips: int = 1,
        logger: Optional[MetricsLogger] = None,
        media_fn: Optional[Callable] = None,
    ):
        # media_fn(state, batch, rng, global_step) -> None renders the
        # reference's per-cb_freq rich media (STFT panels, phasegrams,
        # resynthesized audio — train.py:170-178) into the run directory
        self.cfg = cfg
        self.step_fn = step_fn
        self.state = state
        self.eval_fn = eval_fn
        self.run_name = run_name
        self.mode_schedule = mode_schedule
        self.checkpoint_policy = checkpoint_policy
        self.media_fn = media_fn
        self.mode = 0 if mode_schedule == "cycle" else fixed_mode
        # --mode_schedule random:<pa>,<pv>,<pav>: weighted draw over
        # {audio-only, visual-only, AV} every mode_freq epochs — the
        # curriculum-RATIO knob the reference's uniform randint lacks
        # (train.py:239-241 cycles; train_avse_frames.py:219 draws {0,1})
        self._mode_probs = None
        if mode_schedule.startswith("random:"):
            ws = np.asarray([float(x) for x in
                             mode_schedule[len("random:"):].split(",")],
                            np.float64)
            if ws.shape != (3,) or (ws < 0).any() or ws.sum() <= 0:
                raise ValueError(
                    f"bad mode_schedule {mode_schedule!r}: want "
                    "random:<pa>,<pv>,<pav>")
            self._mode_probs = ws / ws.sum()
            self.mode = 2  # start in AV, like 'fixed'
        # --noise_schedule: per-step annealed noise std, fed to the compiled
        # step as a traced scalar (train/steps._jit_step); None = the
        # constant-noise_scalar program (byte-identical to historical)
        from maavss_tpu.train.setup import resolve_noise_schedule

        self._noise_fn = resolve_noise_schedule(cfg)
        self.logger = logger or MetricsLogger(
            cfg.log_dir, run_name, use_wandb=cfg.wandb,
            config=dataclasses.asdict(cfg),
        )
        self.meter = Meter(n_chips)
        # MAAVSS_WATCH=1: parameter histograms every cb_freq steps into
        # histograms.jsonl (+ wandb mirror) — the reference's
        # wandb.watch(log="all") channel (train.py:109). Opt-in because it
        # fetches the full param tree to the host each callback (slow on
        # relay-attached chips); grad/param NORMS are always on, computed
        # inside the compiled step (train/steps.py:_watch_metrics).
        self._watch = os.environ.get("MAAVSS_WATCH") == "1"
        self.epoch = 0
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._np_rng = np.random.default_rng(cfg.seed)
        # preemption safety (production TPU pools deliver SIGTERM before
        # reclaiming a VM; the reference loses up to an epoch of work —
        # SURVEY.md §5.3 "no preemption handling"). The handler only sets a
        # flag; fit() finishes the in-flight step, drains metrics, saves a
        # checkpoint and returns cleanly, so `-c` resumes from the same epoch.
        self._preempted: Optional[int] = None

        if cfg.c or cfg.checkpoint is not None:
            self.state, self.epoch = load_checkpoint(
                cfg.cp_dir, self.state, auto=cfg.c, path=cfg.checkpoint,
                load_opt=cfg.cp_load_opt,
            )

    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _param_histograms(self, bins: int = 64):
        """64-bin histogram of every top-level param group, host-side."""
        hists = {}
        for k in self.state.params.keys():
            leaves = jax.tree_util.tree_leaves(self.state.params[k])
            flat = np.concatenate(
                [np.asarray(l, np.float32).ravel() for l in leaves])
            counts, edges = np.histogram(flat, bins=bins)
            hists[f"params/{k}"] = (counts, edges)
        return hists

    def _advance_mode(self) -> None:
        if self.mode_schedule == "cycle":
            if self.epoch % self.cfg.mode_freq == 0:
                self.mode = (self.mode + 1) % 3  # train.py:239-241
        elif self.mode_schedule == "random01":
            if self.epoch % self.cfg.mode_freq == 0:
                # reference quirk: randint(0,2) -> {0,1} only
                self.mode = int(self._np_rng.integers(0, 2))
        elif self._mode_probs is not None:
            if self.epoch % self.cfg.mode_freq == 0:
                self.mode = int(self._np_rng.choice(3, p=self._mode_probs))

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT -> set the preempt flag (main thread only; under
        pytest-in-thread or embedded use, signal.signal raises and the
        feature degrades to off). A SECOND SIGINT restores the previous
        handler and raises KeyboardInterrupt immediately — a graceful exit
        needs the in-flight step to finish, which on a wedged relay compile
        (CLAUDE.md) never happens, so repeated Ctrl+C must still kill."""
        previous = {}

        def handler(signum, frame):
            del frame
            if signum == signal.SIGINT and self._preempted is not None:
                self._restore_signal_handlers(previous)
                raise KeyboardInterrupt
            self._preempted = signum

        try:
            for s in (signal.SIGTERM, signal.SIGINT):
                previous[s] = signal.signal(s, handler)
        except ValueError:  # not in the main thread
            pass
        return previous

    def _restore_signal_handlers(self, previous) -> None:
        for s, h in previous.items():
            try:
                signal.signal(s, h)
            except ValueError:
                pass

    def _preempt_exit(self, drain, global_step: int,
                      last_metrics) -> TrainState:
        drain()
        if not self.cfg.no_save:
            save_checkpoint(self.cfg.cp_dir, self.run_name, self.state,
                            self.epoch, last_metrics.get("loss", 0.0))
        name = signal.Signals(self._preempted).name
        self.logger.log({"preempted": 1.0, "epoch": self.epoch},
                        step=global_step)
        print(f"{name} received: checkpoint saved at epoch {self.epoch} "
              f"step {global_step}; resume with -c")
        return self.state

    def fit(self, train_batches: Iterator, val_batches: Optional[Iterator] = None
            ) -> TrainState:
        previous_handlers = self._install_signal_handlers()
        try:
            return self._fit(train_batches, val_batches)
        finally:
            self._restore_signal_handlers(previous_handlers)

    def _fit(self, train_batches: Iterator, val_batches: Optional[Iterator] = None
             ) -> TrainState:
        cfg = self.cfg
        best_val = float("inf")
        global_step = int(self.state.step)
        k = max(1, cfg.steps_per_dispatch)
        if cfg.steps_per_epoch % k:
            raise ValueError(
                f"steps_per_epoch={cfg.steps_per_epoch} must be a multiple of "
                f"steps_per_dispatch={k}")

        # deferred metrics: converting device scalars blocks until that step
        # finishes — one sync costs a full round trip on remote/tunnelled
        # runtimes. Steps are enqueued back to back; their metrics buffer as
        # device arrays and are drained in bulk every cb_freq steps (and at
        # epoch end), still writing one JSONL record per step. With
        # steps_per_dispatch > 1 each entry carries K stacked per-step metric
        # vectors and expands to K records.
        pending = []  # [(gstep_of_first, epoch, mode, step_in_epoch, metrics)]

        def drain():
            host = {}
            for gstep, pe, pmode, pi, m in pending:
                hm = {key: np.asarray(v) for key, v in m.items()}
                for j in range(k):
                    host = {key: float(v[j] if v.ndim else v)
                            for key, v in hm.items()}
                    self.logger.log(
                        {**host, "mode": pmode, "epoch": pe,
                         "clips_per_sec_per_chip": self.meter.clips_per_sec_per_chip},
                        step=gstep + j,
                    )
                if pi % cfg.cb_freq == 0:
                    print(f"epoch {pe} step {pi}/{cfg.steps_per_epoch} "
                          f"loss {host.get('loss', float('nan')):.6f} "
                          f"mode {pmode} "
                          f"{self.meter.clips_per_sec_per_chip:.2f} clips/s/chip")
            pending.clear()
            return host

        last_metrics = {}
        for e in range(self.epoch, cfg.epochs):
            self.epoch = e
            self.meter.reset()
            for i in range(0, cfg.steps_per_epoch, k):
                batch = next(train_batches)
                if self._noise_fn is not None:
                    # annealed noise std rides as a traced scalar — no
                    # recompile across values (K-dispatches share one value)
                    self.state, metrics = self.step_fn(
                        self.state, batch, self._next_rng(),
                        jnp.int32(self.mode),
                        jnp.float32(self._noise_fn(global_step)),
                    )
                else:
                    self.state, metrics = self.step_fn(
                        self.state, batch, self._next_rng(),
                        jnp.int32(self.mode)
                    )
                lead = jax.tree_util.tree_leaves(batch)[0]
                bsz = lead.shape[1] if k > 1 else lead.shape[0]
                self.meter.update(bsz * k)
                pending.append((global_step + 1, e, self.mode, i, metrics))
                global_step += k
                if i % cfg.cb_freq < k:  # a cb boundary falls in this dispatch
                    last_metrics = drain() or last_metrics
                    if self._watch:
                        self.logger.log_histograms(
                            self._param_histograms(), step=global_step)
                    if self.media_fn is not None:
                        try:
                            mbatch = batch if k == 1 else jax.tree_util.tree_map(
                                lambda x: x[0], batch)
                            self.media_fn(self.state, mbatch, self._next_rng(),
                                          global_step)
                        except Exception as err:  # media must never kill a run
                            print(f"media callback failed: {err}")
                if cfg.cp_freq and not cfg.no_save and \
                        global_step // cfg.cp_freq > (global_step - k) // cfg.cp_freq:
                    save_checkpoint(cfg.cp_dir, self.run_name, self.state, e,
                                    last_metrics.get("loss", 0.0))
                if self._preempted is not None:
                    return self._preempt_exit(drain, global_step, last_metrics)
            last_metrics = drain() or last_metrics  # flush the epoch tail
            if self._preempted is not None:
                return self._preempt_exit(drain, global_step, last_metrics)

            val_loss = None
            if self.eval_fn is not None and val_batches is not None and cfg.val_steps > 0:
                vals = []
                for _ in range(cfg.val_steps):
                    # a SIGTERM grace window (30-90 s on TPU pools) is shorter
                    # than a val sweep on relay-attached chips: bail between
                    # eval dispatches too, not only at train-step boundaries
                    if self._preempted is not None:
                        return self._preempt_exit(drain, global_step,
                                                  last_metrics)
                    vmetrics = self.eval_fn(
                        self.state, next(val_batches), self._next_rng(),
                        jnp.int32(self.mode),
                    )
                    vals.append(float(vmetrics["loss"]))
                val_loss = float(np.mean(vals))
                self.logger.log({"val_loss": val_loss, "epoch": e}, step=global_step)
                print(f"epoch {e} val_loss {val_loss:.6f}")

            if not cfg.no_save:
                if self.checkpoint_policy == "epoch":
                    save_checkpoint(cfg.cp_dir, self.run_name, self.state, e,
                                    last_metrics.get("loss", 0.0))
                elif self.checkpoint_policy == "best" and val_loss is not None:
                    if val_loss < best_val:
                        best_val = val_loss
                        save_checkpoint(cfg.cp_dir, self.run_name, self.state,
                                        e, val_loss)

            if self._preempted is not None:
                return self._preempt_exit(drain, global_step, last_metrics)
            self._advance_mode()
        return self.state
