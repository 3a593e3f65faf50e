"""Jit-compiled, mesh-sharded train steps for every reference training regime.

Each factory returns one compiled `step(state, batch, rng, mode) -> (state,
metrics)` containing the *entire* per-step pipeline on device (under
--noise_schedule the denoising regimes accept an optional 5th argument, the
traced noise std — see _jit_step):

  raw audio/frames -> STFT + noise + normalization + phasegram (preprocess)
  -> sliding-window forward/backward with gradient accumulation (lax.scan)
  -> one optimizer update.

The reference runs this as Python: per-window `loss.backward()` in an inner
loop (train.py:136-162), phasegram recomputed on host per window
(train.py:139), noise/normalization inside Dataset.__getitem__. Here the
windows are a `lax.scan` over window starts — XLA sees one fused program, the
MXU stays hot, and there is no host↔device traffic inside a step.

Modality-dropout curriculum (train.py:123-130, train_avse_frames.py:126-136):
`mode` is a traced scalar (0=audio-only, 1=visual-only, 2=AV) so switching
modes does NOT recompile; inactive inputs are zero-masked exactly like the
reference zeroes its tensors.

Sharding: batch inputs `P('data')`, state replicated; GSPMD inserts the
gradient all-reduce over ICI. BatchNorm batch statistics therefore aggregate
over the *global* batch, matching reference single-device semantics.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maavss_tpu.config import RunConfig
from maavss_tpu.ops.phasegram import (
    phasegram_cumsum,
    phasegram_window,
    video_phasegram,
)
from maavss_tpu.ops.stft import stft_features
from maavss_tpu.parallel.mesh import DATA_AXIS
from maavss_tpu.train.state import TrainState

Metrics = Dict[str, jnp.ndarray]

# _jit_step sentinel: "this factory's step has no noise argument" (vs a
# RunConfig, which routes --noise_schedule; see _jit_step's docstring)
_NO_NOISE = object()


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def _l2_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def _watch_metrics(grads, params) -> Metrics:
    """Gradient/parameter observability (reference: wandb.watch(log='all')
    records grad/param histograms every step, train.py:109): global l2 norms
    plus per-top-level-module gradient norms, fused into the compiled step as
    scalars. Histograms are the Trainer's opt-in MAAVSS_WATCH channel
    (exp/metrics.py) — a separate device program, kept off the default path
    because extra compiles are expensive on relay-attached chips."""
    m = {"grad_norm": _l2_norm(grads), "param_norm": _l2_norm(params)}
    for k in grads.keys():
        m[f"grad_norm/{k}"] = _l2_norm(grads[k])
    return m


def _train_apply(model, remat: bool):
    """The train-mode forward used inside windowed grads; `remat` wraps it in
    jax.checkpoint so the backward recomputes activations instead of holding
    them (lifts the frames regime past its b128 HBM ceiling at ~1/3 extra
    FLOPs). Gradients are bitwise-equivalent (tests/test_train_steps.py).

    MAAVSS_REMAT_POLICY picks what checkpoint SAVES (trace-time env knob for
    the memory-bound fusion regime, where the lever is HBM bytes, not FLOPs
    — BASELINE.md round 4f: fullgrad at 98.3% of HBM speed-of-light):
      full (default) — save nothing, recompute everything in the backward;
      dots           — save MXU (dot/conv) outputs, recompute the
                       elementwise chains (BN, leaky, reshapes) so their
                       intermediates never round-trip HBM.
    """

    def fwd(params, bstats, x_a, x_v):
        return model.apply({"params": params, "batch_stats": bstats},
                           x_a, x_v, train=True, mutable=["batch_stats"])

    return _apply_remat(fwd) if remat else fwd


def _apply_remat(fwd: Callable) -> Callable:
    """jax.checkpoint with the MAAVSS_REMAT_POLICY save policy (see
    _train_apply's docstring)."""
    policy = os.environ.get("MAAVSS_REMAT_POLICY", "full")
    if policy == "full":
        return jax.checkpoint(fwd)
    if policy == "dots":
        return jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f"MAAVSS_REMAT_POLICY={policy!r} (full|dots)")



def frames_f32(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] (the wire format, 4x cheaper host->device) or float
    [0,1] -> float32 [0,1], converted on device."""
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) * (1.0 / 255.0)
    return frames

def norm_per_example(feats: jnp.ndarray) -> jnp.ndarray:
    """Per-example max-abs STFT normalization (av_dataset.py:339-340 runs per
    dataset item; batched here, so the max is per example, not global)."""
    axes = tuple(range(1, feats.ndim))
    m = jnp.max(jnp.abs(feats) + 1e-7, axis=axes, keepdims=True)
    return feats / m


def attn_diff_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """--attn_diff: attention frames -> their temporal difference with a
    zero-padded first frame (av_dataset.py:322-325; the reference's CACHED
    read path diffs the wrong axis with no pad — torch.diff default dim at
    av_dataset.py:268 — we implement the intended op everywhere, documented
    deviation). Applies along the frame axis of [B, T, H, W] (or [B,T,1,H,W])."""
    d = jnp.diff(frames, axis=1)
    pad = jnp.zeros_like(d[:, :1])
    return jnp.concatenate([pad, d], axis=1)


def _vis_frames(batch, cfg: RunConfig) -> jnp.ndarray:
    """Raw attention frames -> float32 [0,1] (+ --attn_diff temporal diff)."""
    frames = frames_f32(batch["frames"])
    return attn_diff_frames(frames) if cfg.attn_diff else frames


def _pflat_from_batch(batch, cfg: RunConfig) -> jnp.ndarray:
    """Per-frame phasegram cumsum rows [B, T, p^2] for the fusion regimes:
    precomputed at ingest (batch['pgram'], float16 rows from
    save_phasegrams.py — skips the per-step fft2/fftshift/angle/cumsum chain)
    or computed on device from the raw frames."""
    if "pgram" in batch:
        if cfg.attn_diff:
            raise ValueError(
                "--attn_diff differentiates the raw attention frames before "
                "the phasegram fft2, which precomputed --pgram_cache rows "
                "skip; drop one of the two flags")
        return batch["pgram"].astype(jnp.float32)
    frames = _vis_frames(batch, cfg)
    resize = None if frames.shape[-1] == cfg.p_size else (cfg.p_size, cfg.p_size)
    return phasegram_cumsum(frames, resize=resize)


def _fusion_batch_spec(cfg: RunConfig):
    return {"audio": 0, "pgram" if cfg.pgram_cache else "frames": 0}


def _multistep(step: Callable, k: int) -> Callable:
    """K optimizer steps inside ONE compiled program: `lax.scan` over K
    stacked batches (leading axis K on every batch leaf), carrying the train
    state. This is the dispatch-amortization lever for host/relay-bound
    regimes: one host->device round trip launches K full train steps instead
    of one. Per-step semantics are bit-preserved — each scanned step is the
    unmodified single-step body (windows, BatchNorm updates, optimizer
    update), with its own folded rng — and metrics come back stacked [K] so
    the Trainer still logs one record per optimizer step."""

    def kstep(state: TrainState, batches, rng: jax.Array, mode: jnp.ndarray):
        def body(st, inp):
            i, batch = inp
            st, metrics = step(st, batch, jax.random.fold_in(rng, i), mode)
            return st, metrics

        return jax.lax.scan(body, state, (jnp.arange(k), batches))

    return kstep


def _jit_step(step: Callable, mesh: Optional[Mesh], batch_spec: Any,
              state_shardings: Any = None, k_steps: int = 1,
              noise: Any = _NO_NOISE):
    """Compile with shardings when a mesh is given (single-device otherwise).

    `state_shardings` (a state-shaped pytree of NamedShardings from
    parallel.mesh.shard_state) tensor-shards the wide kernels over 'model'
    (--mesh_model); when absent the state is replicated and only the batch is
    sharded (pure data parallelism). `k_steps > 1` wraps the body in
    _multistep — batch leaves then carry a leading stack axis [K, B, ...]
    sharded P(None, 'data').

    `noise` (factories with a denoising objective pass it): the inner `step`
    then has signature (state, batch, rng, mode, noise). _NO_NOISE = the
    step is the plain 4-arg form. A RunConfig = --noise_schedule routing:
      * schedule unset -> noise_scalar is partially applied as a Python
        float BEFORE compilation, so the compiled program is byte-identical
        to the historical 4-arg one (the constant folds into the HLO);
      * schedule set -> noise compiles as a TRACED replicated scalar and
        the returned callable accepts an optional 5th argument (defaulting
        to a cached device scalar of cfg.noise_scalar), so one compile
        serves every annealed value and every legacy 4-arg call site."""
    traced_noise = False
    default_noise = None
    if noise is not _NO_NOISE:
        cfg_ = noise
        default_noise = float(cfg_.noise_scalar)
        if getattr(cfg_, "noise_schedule", None):
            traced_noise = True
        else:
            step = functools.partial(step, noise=default_noise)
    if k_steps > 1:
        step = _multistep_noise(step, k_steps) if traced_noise else \
            _multistep(step, k_steps)
    if not traced_noise:
        return _jit_plain(step, mesh, batch_spec, state_shardings, k_steps)

    if mesh is None:
        compiled = jax.jit(step, donate_argnums=(0,))
    else:
        repl = NamedSharding(mesh, P())
        bspec = P(None, DATA_AXIS) if k_steps > 1 else P(DATA_AXIS)
        bshard = NamedSharding(mesh, bspec)
        batch_shardings = jax.tree_util.tree_map(lambda _: bshard, batch_spec)
        sshard = state_shardings if state_shardings is not None else repl
        compiled = jax.jit(
            step,
            donate_argnums=(0,),
            in_shardings=(sshard, batch_shardings, repl, repl, repl),
            out_shardings=(sshard, repl),
        )

    cache: list = []

    def _resolve(noise_val):
        if noise_val is None:
            if not cache:
                cache.append(jnp.float32(default_noise))
            return cache[0]
        return jnp.asarray(noise_val, jnp.float32)

    def call(state, batch, rng, mode, noise=None):
        return compiled(state, batch, rng, mode, _resolve(noise))

    # AOT surface (exp/profiling.compile_report drives product steps
    # through .lower) — fill the default like the call path does
    call.lower = lambda state, batch, rng, mode, noise=None: compiled.lower(
        state, batch, rng, mode, _resolve(noise))
    return call


def _multistep_noise(step: Callable, k: int) -> Callable:
    """_multistep for the traced-noise step form (state, batch, rng, mode,
    noise): one annealed noise value per DISPATCH (the schedule advances per
    optimizer step on the host; inside a K-dispatch the K steps share it —
    documented --steps_per_dispatch x --noise_schedule granularity)."""

    def kstep(state: TrainState, batches, rng: jax.Array, mode: jnp.ndarray,
              noise: jnp.ndarray):
        def body(st, inp):
            i, batch = inp
            st, metrics = step(st, batch, jax.random.fold_in(rng, i), mode,
                               noise)
            return st, metrics

        return jax.lax.scan(body, state, (jnp.arange(k), batches))

    return kstep


def _jit_plain(step: Callable, mesh: Optional[Mesh], batch_spec: Any,
               state_shardings: Any, k_steps: int):
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    bspec = P(None, DATA_AXIS) if k_steps > 1 else P(DATA_AXIS)
    bshard = NamedSharding(mesh, bspec)
    batch_shardings = jax.tree_util.tree_map(lambda _: bshard, batch_spec)
    sshard = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(sshard, batch_shardings, repl, repl),
        out_shardings=(sshard, repl),
    )


def _prep_stft_pair(
    audio: jnp.ndarray, cfg: RunConfig, rng: jax.Array, trim_end: bool,
    max_norm: bool, noise_scalar=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audio [B,S] -> (x_stft, y_stft) [B,2,T,F]: optional SoX-contrast
    compression (--compress_audio, av_dataset.py:213-214), STFT, optional
    per-example max-norm, then additive-noise input
    (av_dataset.py:335-342,217-220). Shared by the train steps, the eval fns
    AND the separators, so features always match across them.

    `noise_scalar` overrides cfg.noise_scalar — a Python float (baked
    constant) or a traced scalar (--noise_schedule curriculum; the train
    steps thread it so one compile serves every annealed value)."""
    if noise_scalar is None:
        noise_scalar = cfg.noise_scalar
    if cfg.compress_audio:
        from maavss_tpu.ops.audio import contrast

        audio = contrast(audio)
    y = stft_features(
        audio, cfg.fft_len, cfg.hop,
        normalized=cfg.normalize_fft, trim_end=trim_end, polar=cfg.use_polar,
    )
    if max_norm:
        y = norm_per_example(y)
    x = y + jax.random.normal(rng, y.shape, y.dtype) * jnp.asarray(
        noise_scalar, y.dtype)
    return x, y


def _window_grads(
    window_loss: Callable[[Any, Any, jnp.ndarray], Tuple[jnp.ndarray, Tuple[Any, Metrics]]],
    params: Any,
    bstats: Any,
    num_windows: int,
) -> Tuple[Any, Any, Metrics]:
    """Scan `num_windows` sliding windows, summing grads and carrying
    BatchNorm stats (train.py:136-162's per-window backward) — no optimizer
    update, so callers can nest this inside a microbatch scan."""
    grad_fn = jax.value_and_grad(window_loss, has_aux=True)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    zero_metrics = {"loss": jnp.zeros(()), "a_loss": jnp.zeros(()), "v_loss": jnp.zeros(())}

    def body(carry, j):
        grads_acc, bstats, macc = carry
        (loss, (new_bstats, m)), grads = grad_fn(params, bstats, j)
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        macc = {k: macc[k] + m[k] / num_windows for k in macc}
        return (grads_acc, new_bstats, macc), None

    (grads, bstats, metrics), _ = jax.lax.scan(
        body, (zero_grads, bstats, zero_metrics), jnp.arange(num_windows)
    )
    return grads, bstats, metrics


def _accumulate(
    window_loss: Callable[[Any, Any, jnp.ndarray], Tuple[jnp.ndarray, Tuple[Any, Metrics]]],
    state: TrainState,
    num_windows: int,
) -> Tuple[TrainState, Metrics]:
    """_window_grads + one optimizer step at the end (train.py:136-162:
    per-window loss/num_seq backward, then a single optimizer.step())."""
    grads, bstats, metrics = _window_grads(
        window_loss, state.params, state.batch_stats, num_windows)
    metrics = {**metrics, **_watch_metrics(grads, state.params)}
    new_state = state.apply_gradients(grads=grads, batch_stats=bstats)
    return new_state, metrics


def _microbatch_accumulate(
    state: TrainState,
    mb: int,
    leaves: Tuple[jnp.ndarray, ...],
    chunk_grads: Callable,
    ) -> Tuple[TrainState, Metrics]:
    """Scan `mb` sequential batch chunks per optimizer step (--microbatch):
    `chunk_grads(params, bstats, *chunk_leaves) -> (grads, bstats, metrics)`
    runs per chunk, grads are averaged over chunks (each chunk's mse already
    averages its B/mb examples, so the mean over equal chunks equals the
    full-batch mean), BatchNorm statistics carry chunk to chunk (the
    documented deviation — same as the window scan carries them window to
    window). Caps peak memory at one chunk's forward/backward."""
    b = leaves[0].shape[0]
    if b % mb:
        raise ValueError(f"batch size {b} not divisible by microbatch {mb}")
    chunked = tuple(t.reshape((mb, b // mb) + t.shape[1:]) for t in leaves)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    zero_metrics = {"loss": jnp.zeros(()), "a_loss": jnp.zeros(()),
                    "v_loss": jnp.zeros(())}

    def body(carry, chunk):
        grads_acc, bstats, macc = carry
        grads, bstats, m = chunk_grads(state.params, bstats, *chunk)
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        macc = {k: macc[k] + m[k] / mb for k in macc}
        return (grads_acc, bstats, macc), None

    (grads, bstats, metrics), _ = jax.lax.scan(
        body, (zero_grads, state.batch_stats, zero_metrics), chunked)
    grads = jax.tree_util.tree_map(lambda g: g / mb, grads)
    metrics = {**metrics, **_watch_metrics(grads, state.params)}
    return state.apply_gradients(grads=grads, batch_stats=bstats), metrics


# ---------------------------------------------------------------------------
# Fusion model (train.py / train_av_net.py regimes)
# ---------------------------------------------------------------------------

def _fusion_full_geometry(model, cfg: RunConfig) -> Tuple[int, int, int]:
    """Latent-window geometry for --fusion_encode full: (hop_a, hop_v, t_win).

    Re-derives the encoder plans (models/shape_plan.py — the same closed-form
    planner the model's setup uses) to map the window hop from input time to
    latent time. The STFT encoder's time-stride product divides
    hops_per_frame at the reference geometry (both are the power-of-2
    halving chain); anything else is rejected loudly rather than silently
    mis-sliced."""
    from maavss_tpu.models.shape_plan import (
        conv_out,
        plan_phasegram_encoder,
        plan_stft_encoder_fusion,
    )

    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    pg_enc, pg_hw = plan_phasegram_encoder(
        model.pgram_shape, model.latent_channels, model.fc_size)
    a_enc, _ = plan_stft_encoder_fusion(
        model.stft_shape, pg_hw, model.latent_channels)
    t_win = pg_hw[0]  # == num_frames (the pgram encoder never strides time)

    def sim_t(specs, t: int) -> int:
        for sp in specs:
            t = conv_out(t, sp.kernel[0], sp.stride[0], sp.padding[0])
        return t

    s_a = 1
    for sp in a_enc:
        s_a *= sp.stride[0]
    if s_a == 0 or a % s_a != 0:
        raise ValueError(
            f"--fusion_encode full: the STFT encoder's time-stride product "
            f"{s_a} does not divide hops_per_frame={a}; latent windows "
            f"cannot be sliced at this geometry — use fusion_encode=window")
    hop_a, hop_v = a // s_a, 1
    t_full_a = sim_t(a_enc, (nf + ns - 1) * a)
    t_full_v = sim_t(pg_enc, nf + ns - 1)
    if t_full_a != t_win + (ns - 1) * hop_a or t_full_v != nf + ns - 1:
        raise ValueError(
            f"--fusion_encode full: full-sequence latent lengths "
            f"(a={t_full_a}, v={t_full_v}) do not tile {ns} windows of "
            f"t={t_win} at hops ({hop_a},{hop_v}) — the conv chain's "
            f"rounding broke alignment; use fusion_encode=window")
    return hop_a, hop_v, t_win


def make_fusion_step(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                     window_mode: str = "scan", state_shardings=None,
                     k_steps: int = 1):
    """Train step for AVFusionModel over `batch = {'audio': [B, S_total],
    'frames': [B, T_total, p, p]}` with T_total = num_frames + num_seq
    attention frames already at phasegram resolution.

    Windowed objective with modality curriculum (train.py:112-181).

    window_mode:
    - 'scan' (default): sequential windows with gradient accumulation —
      exact reference semantics (each window's BatchNorm batch is that
      window alone, stats update window by window).
    - 'vectorized': all `num_seq` windows fold into the batch dimension and
      run as ONE forward/backward. Gradients are mathematically identical
      up to BatchNorm, whose statistics are computed over all windows at
      once (a larger, arguably better batch). Measured fetch-closed on v5e
      (bf16, b128) this is ~16% FASTER than scan (BASELINE.md) and is
      bench.py's default; RunConfig keeps 'scan' as its default for exact
      reference semantics (per-window BatchNorm batches).

    `cfg.microbatch > 1` scans M sequential batch chunks per optimizer step
    (grads averaged; same scheme as the frames regime) — headroom for
    batches past the HBM ceiling. Deviations, as everywhere microbatching
    chunks the batch: BatchNorm statistics and the phasegram windows'
    global max-norm are per-chunk (carried/computed over B/M examples).
    """
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    coeff, obj_zeros = cfg.loss_coeff, cfg.objective_zeros
    if window_mode not in ("scan", "vectorized"):
        raise ValueError(f"unknown window_mode {window_mode}")
    encode = getattr(cfg, "fusion_encode", "window")
    if encode not in ("window", "full"):
        raise ValueError(f"unknown fusion_encode {encode!r} (window|full)")
    apply_train = _train_apply(model, cfg.remat)
    mb = max(1, int(cfg.microbatch))

    def _masks(mode):
        return (jnp.where(mode == 1, 0.0, 1.0),  # visual-only zeroes audio in
                jnp.where(mode == 0, 0.0, 1.0),  # audio-only zeroes visual in
                jnp.where((mode == 1) & bool(obj_zeros), 0.0, 1.0))

    if encode == "full":
        # --fusion_encode full: run BOTH conv encoders ONCE over the whole
        # (nf+ns-1)-frame span and slice ns latent windows before the
        # LSTM+FC heads — encoder input shrinks ns*nf -> nf+ns-1 frames
        # (~2.9x at the defaults) on a step measured AT the HBM roofline
        # (BASELINE.md round 4f), so the saved bytes are the binding
        # resource. Documented deviations vs the reference's windowed apply
        # (train.py:123-162), same class as frames_encode=full:
        # (a) interior windows see real temporal neighbors through the STFT
        #     encoder's k=5 time padding instead of each window's zero pad
        #     (the pgram encoder has k_t=1 — no temporal context either way);
        # (b) BatchNorm statistics are one full-sequence encoder update per
        #     step instead of ns window updates;
        # (c) the phasegram temporal diff + max-abs normalization run over
        #     the full span once (true diff at window seams, one global max)
        #     instead of per window.
        # Identical to the vectorized window mode when num_seq == 1
        # (tests/test_fusion_fullenc.py). This path supersedes window_mode —
        # the heads are vectorized over windows by construction.
        hop_a, hop_v, t_win = _fusion_full_geometry(model, cfg)
        # MAAVSS_FULLENC_LOSS: how the two mse targets meet the folded head
        # outputs. 'fold' materializes ys_b/ypg_b window copies ([B*ns,...]
        # stacks — ypg_b alone is B*ns*nf*p^2, ~2.9x the span it duplicates);
        # 'slice' reshapes the head output to [B,ns,...] and reduces each
        # window against a plain slice of the span tensor — same math
        # (windows have equal element counts, so mean-of-window-means ==
        # global mean up to fp reduction order), fewer bytes on a step
        # measured AT the HBM roofline (r4i: fc_heads span 2.36 GB).
        # Measured on chip (BASELINE.md round 5b, b256): slice 26,399 vs
        # fold 25,288 clips/s/chip (+4.4%), and +6.5% with --mask_head —
        # auto resolves to the winner on TPU; fold elsewhere (off-TPU the
        # per-window reductions serialize for no byte win).
        loss_impl = os.environ.get("MAAVSS_FULLENC_LOSS", "auto")
        if loss_impl == "auto":
            loss_impl = ("slice" if jax.default_backend() == "tpu"
                         else "fold")
        if loss_impl not in ("fold", "slice"):
            raise ValueError(
                f"MAAVSS_FULLENC_LOSS={loss_impl!r} (auto|fold|slice)")

        def enc_fwd(params, bstats, x_a_full, x_v_full):
            return model.apply(
                {"params": params, "batch_stats": bstats}, x_a_full, x_v_full,
                train=True, mutable=["batch_stats"], method=model.encode_both)

        def heads_fwd(params, bstats, lat_a_b, lat_v_b, xs_b):
            # the fusion heads (LSTM + Dense) hold no BatchNorm: nothing to
            # mutate, the encoder-updated stats pass through unchanged
            return model.apply(
                {"params": params, "batch_stats": bstats},
                lat_a_b, lat_v_b, xs_b, train=True,
                method=model.heads_from_latents)

        if cfg.remat:
            enc_fwd = _apply_remat(enc_fwd)
            heads_fwd = _apply_remat(heads_fwd)

        def step_full(state: TrainState, batch, rng: jax.Array,
                      mode: jnp.ndarray, noise):
            mode = jnp.asarray(mode)
            x_full, y_full = _prep_stft_pair(
                batch["audio"], cfg, rng, trim_end=True,
                max_norm=cfg.normalize_output_fft, noise_scalar=noise)
            a_mask, v_mask, ya_mask = _masks(mode)
            p_flat = _pflat_from_batch(batch, cfg)

            def full_grads(params, bstats, x_f, y_f, p_f):
                # encode exactly the span the ns windows cover — a longer
                # tail would leak context into the last window's conv pad
                # and shift the BN batch statistics
                x_used = jax.lax.slice_in_dim(x_f, 0, (nf + ns - 1) * a,
                                              axis=2)
                pg_full = phasegram_window(p_f[:, :nf + ns - 1])

                def wins(full, axis, hop, width):
                    st = jnp.stack(
                        [jax.lax.slice_in_dim(full, j * hop, j * hop + width,
                                              axis=axis)
                         for j in range(ns)], axis=1)  # [B, ns, ...]
                    return st.reshape((-1,) + st.shape[2:])

                def loss_fn(params, bstats):
                    (a_lat, v_lat), mut = enc_fwd(
                        params, bstats, x_used * a_mask, pg_full * v_mask)
                    bstats = mut["batch_stats"]
                    lat_a_b = wins(a_lat, 2, hop_a, t_win)
                    lat_v_b = wins(v_lat, 2, hop_v, t_win)
                    xs_b = wins(x_f, 2, a, nf * a)
                    yh_a, yh_v, _ = heads_fwd(params, bstats, lat_a_b,
                                              lat_v_b, xs_b * a_mask)
                    if loss_impl == "slice":
                        yh_aw = yh_a.reshape((-1, ns) + yh_a.shape[1:])
                        yh_vw = yh_v.reshape((-1, ns) + yh_v.shape[1:])
                        a_loss = sum(
                            mse(yh_aw[:, j],
                                jax.lax.slice_in_dim(y_f, j * a,
                                                     j * a + nf * a, axis=2)
                                * ya_mask)
                            for j in range(ns)) / ns
                        v_loss = sum(
                            mse(yh_vw[:, j],
                                jax.lax.slice_in_dim(pg_full, j, j + nf,
                                                     axis=2))
                            for j in range(ns)) / ns
                    else:
                        ys_b = wins(y_f, 2, a, nf * a)
                        ypg_b = wins(pg_full, 2, 1, nf)
                        a_loss = mse(yh_a, ys_b * ya_mask)
                        v_loss = mse(yh_v, ypg_b)
                    loss = a_loss + coeff * v_loss
                    return loss, (bstats, {"loss": loss, "a_loss": a_loss,
                                           "v_loss": v_loss})

                (_, (bstats, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, bstats)
                return grads, bstats, metrics

            if mb > 1:
                return _microbatch_accumulate(
                    state, mb, (x_full, y_full, p_flat), full_grads)
            grads, bstats, metrics = full_grads(
                state.params, state.batch_stats, x_full, y_full, p_flat)
            metrics = {**metrics, **_watch_metrics(grads, state.params)}
            return state.apply_gradients(grads=grads, batch_stats=bstats), metrics

        return _jit_step(step_full, mesh, _fusion_batch_spec(cfg),
                         state_shardings, k_steps, noise=cfg)

    def step_vectorized(state: TrainState, batch, rng: jax.Array,
                        mode: jnp.ndarray, noise):
        mode = jnp.asarray(mode)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=True,
            max_norm=cfg.normalize_output_fft, noise_scalar=noise
        )
        a_mask, v_mask, ya_mask = _masks(mode)
        p_flat = _pflat_from_batch(batch, cfg)

        def vec_grads(params, bstats, x_f, y_f, p_f):
            # static window offsets -> plain slices, folded into the batch dim
            def fold(full):
                wins = [jax.lax.slice_in_dim(full, j * a, j * a + nf * a, axis=2)
                        for j in range(ns)]
                stacked = jnp.stack(wins, axis=1)  # [B, ns, ...]
                return stacked.reshape((-1,) + stacked.shape[2:])

            # per-window phasegram finishing preserves per-window normalization
            pg_wins = jnp.stack([phasegram_window(p_f[:, j:j + nf])
                                 for j in range(ns)], axis=1)
            y_pg = pg_wins.reshape((-1,) + pg_wins.shape[2:])
            xs = fold(x_f)
            ys = fold(y_f)

            def loss_fn(params, bstats):
                (yh_a, yh_v, _), mut = apply_train(
                    params, bstats, xs * a_mask, y_pg * v_mask)
                a_loss = mse(yh_a, ys * ya_mask)
                v_loss = mse(yh_v, y_pg)
                loss = a_loss + coeff * v_loss
                return loss, (mut["batch_stats"],
                              {"loss": loss, "a_loss": a_loss, "v_loss": v_loss})

            (_, (bstats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bstats)
            return grads, bstats, metrics

        if mb > 1:
            return _microbatch_accumulate(state, mb, (x_full, y_full, p_flat),
                                          vec_grads)
        grads, bstats, metrics = vec_grads(
            state.params, state.batch_stats, x_full, y_full, p_flat)
        metrics = {**metrics, **_watch_metrics(grads, state.params)}
        new_state = state.apply_gradients(grads=grads, batch_stats=bstats)
        return new_state, metrics

    if window_mode == "vectorized":
        return _jit_step(step_vectorized, mesh, _fusion_batch_spec(cfg),
                         state_shardings, k_steps, noise=cfg)

    def make_window_loss(x_full, y_full, p_flat, masks):
        a_mask, v_mask, ya_mask = masks

        def window_loss(params, bstats, j):
            pw = jax.lax.dynamic_slice_in_dim(p_flat, j, nf, axis=1)
            y_pg = phasegram_window(pw)
            xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
            ys = jax.lax.dynamic_slice_in_dim(y_full, j * a, nf * a, axis=2)
            (yh_a, yh_v, _), mut = apply_train(
                params, bstats, xs * a_mask, y_pg * v_mask)
            a_loss = mse(yh_a, ys * ya_mask)
            v_loss = mse(yh_v, y_pg)
            loss = a_loss + coeff * v_loss
            return loss / ns, (mut["batch_stats"],
                               {"loss": loss, "a_loss": a_loss, "v_loss": v_loss})

        return window_loss

    def step(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray,
             noise):
        mode = jnp.asarray(mode)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=True,
            max_norm=cfg.normalize_output_fft, noise_scalar=noise
        )
        masks = _masks(mode)

        # per-frame phase rows computed ONCE for the whole clip (or read
        # precomputed via --pgram_cache); windows share their overlapping
        # frames' fft2 (diff + norm stay per-window, train.py:139 parity)
        p_flat = _pflat_from_batch(batch, cfg)

        if mb > 1:
            def chunk_grads(params, bstats, xf, yf, pf):
                return _window_grads(make_window_loss(xf, yf, pf, masks),
                                     params, bstats, ns)

            return _microbatch_accumulate(state, mb, (x_full, y_full, p_flat),
                                          chunk_grads)
        return _accumulate(make_window_loss(x_full, y_full, p_flat, masks),
                           state, ns)

    return _jit_step(step, mesh, _fusion_batch_spec(cfg), state_shardings,
                     k_steps, noise=cfg)


def make_fusion_middle_step(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                            state_shardings=None, k_steps: int = 1):
    """Fusion model with the middle-frame objective (experiments/train.py:
    148-181): each window's loss compares only the middle frame's
    `hops_per_frame` STFT columns and its single phasegram row.

    The reference's experiment model emits middle-sized heads; here the
    standard AVFusionModel predicts the full window and the loss slices its
    middle — same objective, one model family (functional equivalent,
    documented deviation)."""
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    coeff = cfg.loss_coeff
    idx_middle = (ns - 1) // 2
    apply_train = _train_apply(model, cfg.remat)
    mb = max(1, int(cfg.microbatch))

    def make_window_loss(x_full, y_full, p_flat, masks):
        a_mask, v_mask = masks
        mid_lo, mid_hi = idx_middle * a, (idx_middle + 1) * a

        def window_loss(params, bstats, j):
            pw = jax.lax.dynamic_slice_in_dim(p_flat, j, nf, axis=1)
            y_pg = phasegram_window(pw)
            xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
            ys_mid = jax.lax.dynamic_slice_in_dim(
                y_full, j * a + mid_lo, a, axis=2)
            (yh_a, yh_v, _), mut = apply_train(
                params, bstats, xs * a_mask, y_pg * v_mask)
            a_loss = mse(yh_a[:, :, mid_lo:mid_hi], ys_mid)
            v_loss = mse(yh_v[:, :, idx_middle], y_pg[:, :, idx_middle])
            loss = a_loss + coeff * v_loss
            return loss / ns, (mut["batch_stats"],
                               {"loss": loss, "a_loss": a_loss, "v_loss": v_loss})

        return window_loss

    def step(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray,
             noise):
        mode = jnp.asarray(mode)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=True,
            max_norm=cfg.normalize_output_fft, noise_scalar=noise
        )
        masks = (jnp.where(mode == 1, 0.0, 1.0),
                 jnp.where(mode == 0, 0.0, 1.0))
        p_flat = _pflat_from_batch(batch, cfg)

        if mb > 1:
            def chunk_grads(params, bstats, xf, yf, pf):
                return _window_grads(make_window_loss(xf, yf, pf, masks),
                                     params, bstats, ns)

            return _microbatch_accumulate(state, mb, (x_full, y_full, p_flat),
                                          chunk_grads)
        return _accumulate(make_window_loss(x_full, y_full, p_flat, masks),
                           state, ns)

    return _jit_step(step, mesh, _fusion_batch_spec(cfg), state_shardings,
                     k_steps, noise=cfg)


# ---------------------------------------------------------------------------
# Frames model — middle-frame objective (train_avse_frames.py regime)
# ---------------------------------------------------------------------------

def make_frames_step(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                     state_shardings=None, k_steps: int = 1):
    """Train step for AVFusionFramesModel over `batch = {'audio': [B, S_total],
    'frames': [B, T_total, H, W]}` (raw attention frames at framesize).

    Each window predicts only the middle frame's `hops_per_frame` STFT columns
    and one attention frame (train_avse_frames.py:150-181). STFT keeps the
    Nyquist bin (F = fft_len//2 + 1) per the final model's geometry.

    `cfg.microbatch > 1` scans M sequential batch chunks per optimizer step
    (grads averaged over chunks) — the honest fix for the regime's HBM
    ceiling: b256 OOMs the 16 GB v5e even WITH remat because the first conv3d
    stage's single live intermediate is ~8.6 GB at b256 (measured,
    BASELINE.md round-3 frames table), and rematerialization cannot shrink a
    single op's output. Microbatching caps peak memory at one chunk's
    forward/backward. Deviation: BatchNorm batch statistics are per-chunk
    (carried chunk to chunk like the window scan carries them window to
    window); gradients are exact up to that BN difference
    (tests/test_train_steps.py).
    """
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    coeff, obj_zeros = cfg.loss_coeff, cfg.objective_zeros
    idx_middle = (ns - 1) // 2  # train_avse_frames.py:105
    apply_train = _train_apply(model, cfg.remat)
    mb = max(1, int(cfg.microbatch))
    encode = getattr(cfg, "frames_encode", "window")
    if encode not in ("window", "full"):
        raise ValueError(f"unknown frames_encode {encode!r} (window|full)")
    halo = int(getattr(cfg, "frames_halo", 0))
    if halo and encode != "full":
        raise ValueError("--frames_halo needs --frames_encode full (window "
                         "mode already zero-pads each window's own edges)")
    if halo < 0:
        raise ValueError(f"--frames_halo must be >= 0, got {halo}")

    def make_window_loss(frames, x_full, y_full, masks):
        a_in_mask, v_in_mask, ya_mask, yv_mask = masks

        def window_loss(params, bstats, j):
            fr = jax.lax.dynamic_slice_in_dim(frames, j, nf, axis=1)  # [B,nf,1,H,W]
            x_v = jnp.transpose(fr, (0, 2, 1, 3, 4))  # [B,1,nf,H,W]
            y_v = jax.lax.dynamic_slice_in_dim(frames, j + idx_middle, 1, axis=1)[:, 0]
            xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
            ys = jax.lax.dynamic_slice_in_dim(
                y_full, (j + idx_middle) * a, a, axis=2
            )
            (yh_a, yh_v, _), mut = apply_train(
                params, bstats, xs * a_in_mask, x_v * v_in_mask)
            a_loss = mse(yh_a, ys * ya_mask)
            v_loss = mse(yh_v, y_v * yv_mask)
            loss = a_loss + coeff * v_loss
            return loss / ns, (mut["batch_stats"],
                               {"loss": loss, "a_loss": a_loss, "v_loss": v_loss})

        return window_loss

    def make_full_loss(masks):
        """--frames_encode full: run the conv3d trunk ONCE over the whole
        T_total-frame sequence and slice `ns` latent windows, instead of
        re-encoding `ns` overlapping nf-frame windows (nf*ns = 32 frame-convs
        -> nf+ns-1 = 11 at the defaults, a ~2.9x FLOP cut on the regime's
        dominant stage — BASELINE.md frames stage bisection). Documented
        deviations vs the reference's windowed apply
        (train_avse_frames.py:150-181): (a) interior windows see real
        neighbor frames through the temporal conv padding instead of each
        window's own zero pad; (b) BatchNorm batch statistics are one
        full-sequence update (+ one folded heads update) per step rather
        than ns sequential window updates. Identical to window mode when
        ns == 1 (tests/test_frames_fullseq.py)."""
        a_in_mask, v_in_mask, ya_mask, yv_mask = masks

        def enc_fwd(params, bstats, x_v_all):
            return model.apply({"params": params, "batch_stats": bstats},
                               x_v_all, train=True, mutable=["batch_stats"],
                               method=model.encode_frames)

        def heads_fwd(params, bstats, xs_b, lat_b):
            return model.apply({"params": params, "batch_stats": bstats},
                               xs_b, lat_b, train=True,
                               mutable=["batch_stats"],
                               method=model.forward_with_visual_latent)

        if cfg.remat:
            enc_fwd = jax.checkpoint(enc_fwd)
            heads_fwd = jax.checkpoint(heads_fwd)

        def fold(wins):  # [B, ns, ...] -> [B*ns, ...]
            return wins.reshape((-1,) + wins.shape[2:])

        def full_loss(params, bstats, frames, x_full, y_full):
            # encode exactly the frames the ns windows cover (nf+ns-1, plus
            # `halo` real context frames per side when --frames_halo is set —
            # window j then starts at halo+j, so every training window sees
            # real neighbors like the separator's interior windows do) — any
            # tail beyond that would leak temporal context into the last
            # window's conv padding and shift the BN batch statistics
            fr_used = jax.lax.slice_in_dim(frames, 0, nf + ns - 1 + 2 * halo,
                                           axis=1)
            x_v_all = jnp.transpose(fr_used, (0, 2, 1, 3, 4))  # [B,1,T,H,W]
            v_lat, mut = enc_fwd(params, bstats, x_v_all * v_in_mask)
            bstats = mut["batch_stats"]
            lat_b = fold(jnp.stack(
                [jax.lax.slice_in_dim(v_lat, halo + j, halo + j + nf, axis=2)
                 for j in range(ns)], axis=1))
            xs_b = fold(jnp.stack(
                [jax.lax.slice_in_dim(x_full, (halo + j) * a,
                                      (halo + j) * a + nf * a, axis=2)
                 for j in range(ns)], axis=1))
            ys_b = fold(jnp.stack(
                [jax.lax.slice_in_dim(y_full, (halo + j + idx_middle) * a,
                                      (halo + j + idx_middle) * a + a, axis=2)
                 for j in range(ns)], axis=1))
            yv_b = fold(jnp.stack(
                [frames[:, halo + j + idx_middle] for j in range(ns)], axis=1))
            (yh_a, yh_v, _), mut2 = heads_fwd(params, bstats,
                                              xs_b * a_in_mask, lat_b)
            a_loss = mse(yh_a, ys_b * ya_mask)
            v_loss = mse(yh_v, yv_b * yv_mask)
            loss = a_loss + coeff * v_loss
            return loss, (mut2["batch_stats"],
                          {"loss": loss, "a_loss": a_loss, "v_loss": v_loss})

        return full_loss

    def step(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray,
             noise):
        mode = jnp.asarray(mode)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=False,
            max_norm=cfg.normalize_output_fft, noise_scalar=noise
        )
        frames = _vis_frames(batch, cfg)[:, :, None]  # [B, T_total, 1, H, W]
        masks = (jnp.where(mode == 1, 0.0, 1.0),
                 jnp.where(mode == 0, 0.0, 1.0),
                 jnp.where((mode == 1) & bool(obj_zeros), 0.0, 1.0),
                 jnp.where((mode == 0) & bool(obj_zeros), 0.0, 1.0))

        if encode == "full":
            full_loss = make_full_loss(masks)

            def full_grads(params, bstats, fr, xf, yf):
                (_, (new_bstats, m)), grads = jax.value_and_grad(
                    full_loss, has_aux=True)(params, bstats, fr, xf, yf)
                return grads, new_bstats, m

            if mb == 1:
                grads, bstats, metrics = full_grads(
                    state.params, state.batch_stats, frames, x_full, y_full)
                metrics = {**metrics, **_watch_metrics(grads, state.params)}
                return (state.apply_gradients(grads=grads, batch_stats=bstats),
                        metrics)
            return _microbatch_accumulate(state, mb, (frames, x_full, y_full),
                                          full_grads)

        if mb == 1:
            return _accumulate(make_window_loss(frames, x_full, y_full, masks),
                               state, ns)

        def chunk_grads(params, bstats, fr, xf, yf):
            return _window_grads(make_window_loss(fr, xf, yf, masks),
                                 params, bstats, ns)

        return _microbatch_accumulate(state, mb, (frames, x_full, y_full),
                                      chunk_grads)

    batch_spec = {"audio": 0, "frames": 0}
    return _jit_step(step, mesh, batch_spec, state_shardings, k_steps,
                     noise=cfg)


# ---------------------------------------------------------------------------
# Autoencoder pretraining regimes
# ---------------------------------------------------------------------------

def make_audio_ae_step(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                       trim_end: bool = True, state_shardings=None,
                       k_steps: int = 1):
    """STFT-autoencoder step over `batch = {'audio': [B, samples]}`
    (train_autoencoder.py / train_audio_net.py regimes: denoising mse on the
    AE path, `audio_ae_forward`)."""

    def step(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray,
             noise):
        del mode
        x, y = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=trim_end,
            max_norm=cfg.normalize_fft, noise_scalar=noise
        )

        def loss_fn(params, bstats):
            yh, mut = model.apply(
                {"params": params, "batch_stats": bstats},
                x, train=True, mutable=["batch_stats"],
                method=model.audio_ae_forward,
            )
            loss = mse(yh, y)
            return loss, mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=bstats)
        return new_state, {"loss": loss, "a_loss": loss, "v_loss": jnp.zeros(()),
                           **_watch_metrics(grads, state.params)}

    return _jit_step(step, mesh, {"audio": 0}, state_shardings, k_steps,
                     noise=cfg)


def make_fusion_eval(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                     state_shardings=None):
    """Validation pass for the fusion regime: same windowed objective, no
    grads, BatchNorm in inference mode (running stats) — the reference's
    model.eval() val block (train_av_net.py:147-173)."""
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    coeff = cfg.loss_coeff

    def evaluate(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray):
        mode = jnp.asarray(mode)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=True, max_norm=cfg.normalize_output_fft
        )
        a_mask = jnp.where(mode == 1, 0.0, 1.0)
        v_mask = jnp.where(mode == 0, 0.0, 1.0)
        p_flat = _pflat_from_batch(batch, cfg)

        def window(j):
            pw = jax.lax.dynamic_slice_in_dim(p_flat, j, nf, axis=1)
            y_pg = phasegram_window(pw)
            xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
            ys = jax.lax.dynamic_slice_in_dim(y_full, j * a, nf * a, axis=2)
            yh_a, yh_v, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                xs * a_mask, y_pg * v_mask, train=False,
            )
            a_loss = mse(yh_a, ys)
            v_loss = mse(yh_v, y_pg)
            return a_loss + coeff * v_loss, a_loss, v_loss

        losses = [window(jnp.int32(j)) for j in range(ns)]
        loss = sum(l[0] for l in losses) / ns
        return {"loss": loss,
                "a_loss": sum(l[1] for l in losses) / ns,
                "v_loss": sum(l[2] for l in losses) / ns}

    if mesh is None:
        return jax.jit(evaluate)
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P(DATA_AXIS))
    bspec = jax.tree_util.tree_map(lambda _: bshard, _fusion_batch_spec(cfg))
    sshard = state_shardings if state_shardings is not None else repl
    return jax.jit(
        evaluate,
        in_shardings=(sshard, bspec, repl, repl),
        out_shardings=repl,
    )


def make_audio_ae_eval(model, cfg: RunConfig, trim_end: bool = True):
    """Validation for the STFT-AE regimes (train_audio_net.py:139-162)."""

    @jax.jit
    def evaluate(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray):
        del mode
        x, y = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=trim_end, max_norm=cfg.normalize_fft
        )
        yh = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=model.audio_ae_forward,
        )
        loss = mse(yh, y)
        return {"loss": loss, "a_loss": loss, "v_loss": jnp.zeros(())}

    return evaluate


def make_visual_ae_eval(model, cfg: RunConfig):
    """Validation for the phasegram-AE regime (train_visual_net.py:112-139)."""

    @jax.jit
    def evaluate(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray):
        del rng, mode
        frames = _vis_frames(batch, cfg)
        resize = None if frames.shape[-1] == cfg.p_size else (cfg.p_size, cfg.p_size)
        y_pg = video_phasegram(frames, resize=resize)
        yh = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            y_pg, train=False, method=model.visual_ae_forward,
        )
        loss = mse(yh, y_pg)
        return {"loss": loss, "a_loss": jnp.zeros(()), "v_loss": loss}

    return evaluate


def make_visual_ae_step(model, cfg: RunConfig, mesh: Optional[Mesh] = None,
                        state_shardings=None, k_steps: int = 1):
    """Phasegram-autoencoder step over `batch = {'frames': [B, T, p, p]}`
    (train_visual_net.py / train_3d_conv_net.py regimes)."""

    def step(state: TrainState, batch, rng: jax.Array, mode: jnp.ndarray):
        del rng, mode
        frames = _vis_frames(batch, cfg)
        resize = None if frames.shape[-1] == cfg.p_size else (cfg.p_size, cfg.p_size)
        y_pg = video_phasegram(frames, resize=resize)  # [B,1,T,p^2]

        def loss_fn(params, bstats):
            yh, mut = model.apply(
                {"params": params, "batch_stats": bstats},
                y_pg, train=True, mutable=["batch_stats"],
                method=model.visual_ae_forward,
            )
            loss = mse(yh, y_pg)
            return loss, mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=bstats)
        return new_state, {"loss": loss, "a_loss": jnp.zeros(()), "v_loss": loss,
                           **_watch_metrics(grads, state.params)}

    return _jit_step(step, mesh, {"frames": 0}, state_shardings, k_steps)
