"""Shared entry-script plumbing: data stores, models, states, meshes.

Each reference train script repeats ~60 lines of dataset/model/optimizer
boilerplate (SURVEY.md §2.1); these builders are that boilerplate once. Entry
scripts at the repo root stay thin flag-parsers, preserving the reference's
public CLI surface.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.audio_memmap import AudioMemmap
from maavss_tpu.data.frame_shards import FrameShardStore
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.models.fusion_frames import AVFusionFramesModel
from maavss_tpu.parallel.mesh import make_mesh
from maavss_tpu.train.state import TrainState, create_train_state, make_optimizer

FUSION_SUBNETS = ("lstm", "fc1", "fc2", "a_fc1", "v_fc1")

# Params never depend on the batch dimension (every forward reshapes by the
# runtime x.shape[0]), so init runs at a clamped batch — and jitted, so XLA
# frees/fuses the init intermediates instead of materializing each op.
# Eager full-batch init was BOTH the ~90-100 s relay-latency landmine
# (CLAUDE.md) and an OOM source: the frames model's first conv3d output alone
# is ~33 MB/clip fp32, so eager init at b256 held >8 GB of dead activations.
_INIT_BATCH = 8


def jit_init(model, *input_shapes: Sequence[int], seed: int = 0, method=None):
    """model.init under jit, zeros inputs with the batch axis clamped."""
    def _init(rng):
        xs = [jnp.zeros((min(_INIT_BATCH, s[0]),) + tuple(s[1:]), jnp.float32)
              for s in input_shapes]
        return model.init(rng, *xs, method=method)

    return jax.jit(_init)(jax.random.PRNGKey(seed))


def init_runtime(cache_dir: str = "~/.cache/maavss_jax") -> None:
    """Enable JAX's persistent compilation cache so repeat launches skip XLA
    compilation. Idempotent. Skipped on experimental remote-compile backends
    (e.g. 'axon' tunnels), where the cache write path wedges the compile
    request indefinitely."""
    try:
        if jax.devices()[0].platform not in ("tpu", "cpu", "gpu") or \
                os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
            return
        path = os.path.expanduser(cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache unavailable: {e}")


def resolve_data_root(cfg: RunConfig) -> str:
    """The on-disk store root for cfg.data_path ('synthetic[:N]' resolves to
    its per-geometry fixture directory)."""
    if cfg.data_path.startswith("synthetic"):
        return os.path.join("data", f"synthetic-p{cfg.p_size}")
    return cfg.data_path


def load_stores(cfg: RunConfig, frames_dir: str = "frames", audio_dir: str = "audio",
                ) -> Tuple[Optional[FrameShardStore], Optional[AudioMemmap]]:
    """Open the ingested data stores under cfg.data_path.

    `--data_path synthetic[:N]` builds an on-the-fly synthetic store (no
    MUSICES download needed) under ./data/synthetic — the CI/smoke path.
    """
    if cfg.autocontrast:
        # the reference applies autocontrast inside its on-the-fly attention
        # extraction (av_dataset.py:318-319); here attention is precomputed
        # offline, so a train-time flag would silently do nothing
        raise SystemExit(
            "--autocontrast acts during attention extraction, which happens "
            "at ingest here: pass it to save_attn_videos.py instead")
    if cfg.data_path.startswith("synthetic"):
        from maavss_tpu.data.synthetic import build_synthetic_store

        n = int(cfg.data_path.split(":", 1)[1]) if ":" in cfg.data_path else 4
        # one store per frame size so geometry changes never alias
        out = resolve_data_root(cfg)
        frames_path = os.path.join(out, "frames")
        audio_path = os.path.join(out, "audio")
        if not os.path.exists(os.path.join(frames_path, "meta.json")):
            build_synthetic_store(out, cfg, n_videos=n, seconds=2.0,
                                  frame_size=cfg.p_size)
        return FrameShardStore(frames_path), AudioMemmap(audio_path)

    frames_path = os.path.join(cfg.data_path, frames_dir)
    audio_path = os.path.join(cfg.data_path, audio_dir)
    frames = FrameShardStore(frames_path) if os.path.isdir(frames_path) else None
    audio = AudioMemmap(audio_path) if os.path.isdir(audio_path) else None
    if frames is None and audio is None:
        raise SystemExit(
            f"no ingested data under {cfg.data_path} (expected {frames_dir}/ "
            f"and {audio_dir}/ from tools/ingest.py) — or pass "
            f"--data_path synthetic for the built-in fixture dataset")
    return frames, audio


def load_pgram_store(cfg: RunConfig) -> Optional[FrameShardStore]:
    """Open the precomputed-phasegram shard store when --pgram_cache is set
    (fusion regimes; build with save_phasegrams.py). None when the flag is
    off; a clear SystemExit when the flag is set but the store is missing."""
    if not cfg.pgram_cache:
        return None
    d = os.path.join(resolve_data_root(cfg), f"pgrams-p{cfg.p_size}")
    if not os.path.exists(os.path.join(d, "meta.json")):
        raise SystemExit(
            f"--pgram_cache set but no store at {d} — build it once with: "
            f"python save_phasegrams.py --data_path {cfg.data_path} "
            f"--p_size {cfg.p_size}")
    return FrameShardStore(d)


def resolve_lr(cfg: RunConfig):
    """--lr_schedule: a float (constant — reference parity, train.py:55) or
    an optax schedule over the run's total optimizer steps. A quality lever
    the reference lacks (its Adam runs flat for the whole run)."""
    if cfg.lr_schedule == "constant":
        return cfg.learning_rate
    total = cfg.epochs * cfg.steps_per_epoch
    import optax

    if cfg.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(
            cfg.learning_rate, decay_steps=max(total, 1),
            alpha=cfg.lr_final_scale)
    if cfg.lr_schedule == "warmup_cosine":
        warm = cfg.warmup_steps or max(total // 20, 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warm, decay_steps=max(total, warm + 1),
            end_value=cfg.learning_rate * cfg.lr_final_scale)
    raise SystemExit(f"unknown --lr_schedule {cfg.lr_schedule}")


def resolve_noise_schedule(cfg: RunConfig):
    """--noise_schedule: None (constant --noise_scalar, reference parity —
    av_dataset.py:217-220 applies a flat noise_std) or a step -> noise-std
    float over the run's total optimizer steps:

      linear:<start>:<end>   straight-line anneal start -> end
      cosine:<start>:<end>   half-cosine anneal start -> end

    The Trainer feeds the value to the compiled step as a TRACED scalar
    (train/steps._jit_step), so the anneal never recompiles. Eval and the
    separators keep cfg.noise_scalar — arms stay comparable."""
    spec = cfg.noise_schedule
    if not spec:
        return None
    try:
        kind, start_s, end_s = spec.split(":")
        start, end = float(start_s), float(end_s)
    except ValueError:
        raise SystemExit(
            f"bad --noise_schedule {spec!r}: want linear:<start>:<end> "
            "or cosine:<start>:<end>")
    total = max(cfg.epochs * cfg.steps_per_epoch - 1, 1)
    if kind == "linear":
        return lambda step: start + (end - start) * min(step, total) / total
    if kind == "cosine":
        import math

        return lambda step: end + (start - end) * 0.5 * (
            1.0 + math.cos(math.pi * min(step, total) / total))
    raise SystemExit(
        f"bad --noise_schedule {spec!r}: unknown kind {kind!r} "
        "(linear|cosine)")


def _flat_opt(cfg: RunConfig) -> bool:
    """--fused_opt gate: the flat moment buffers cannot shard per-leaf over
    the 'model' axis (parallel/mesh.shard_state's shape rule), so the
    combination is an error rather than a silent de-optimization."""
    if cfg.fused_opt and cfg.mesh_model > 1:
        raise SystemExit("--fused_opt is incompatible with --mesh_model > 1 "
                         "(flat moment buffers cannot tensor-shard per-leaf)")
    return cfg.fused_opt


def _opt_kernel(cfg: RunConfig, trainable=None, optimizer: str = "adam") -> str:
    """Resolve --opt_kernel. 'auto' picks the measured per-backend winner —
    currently 'xla' everywhere (the pallas kernel is pending its on-chip
    fetch-closed A/B; flip here when BASELINE.md records a win). Explicit
    'pallas' fails loudly on the unsupported combinations instead of
    silently de-optimizing."""
    kernel = cfg.opt_kernel
    if kernel == "auto":
        return "xla"
    if kernel == "pallas":
        if cfg.mesh_model > 1:
            raise SystemExit("--opt_kernel pallas is incompatible with "
                             "--mesh_model > 1 (a pallas_call on a "
                             "'model'-sharded leaf forces a gather)")
        if cfg.fused_opt:
            raise SystemExit("--opt_kernel pallas and --fused_opt are "
                             "mutually exclusive")
        if trainable is not None:
            raise SystemExit("--opt_kernel pallas is incompatible with staged "
                             "trainable-prefix training")
        if optimizer != "adam":
            raise SystemExit("--opt_kernel pallas supports adam only")
    return kernel


def default_mesh(cfg: RunConfig):
    n = len(jax.devices())
    if n <= 1:
        return None
    model = cfg.mesh_model
    data = cfg.mesh_data if cfg.mesh_data != -1 else n // model
    return make_mesh(data=data, model=model)


def apply_mesh_model(cfg: RunConfig, mesh, state):
    """Realize --mesh_model: tensor-shard the wide Dense/LSTM kernels (and
    their Adam moments) over the 'model' mesh axis. Returns (placed_state,
    state_shardings-or-None); pass the shardings into the step factories so
    the compiled program keeps them (train/steps.py:_jit_step). With
    mesh_model == 1 this is a no-op and the state stays replicated."""
    from maavss_tpu.parallel.mesh import MODEL_AXIS, shard_state

    if mesh is None or mesh.shape[MODEL_AXIS] <= 1:
        return state, None
    return shard_state(mesh, state)


def build_fusion(cfg: RunConfig, batch_size: int,
                 trainable: Optional[Sequence[str]] = None,
                 optimizer: str = "adam") -> Tuple[AVFusionModel, TrainState]:
    if cfg.mask_head and cfg.use_polar:
        raise SystemExit("--mask_head needs rectangular (re,im) STFT features; "
                         "drop --use_polar")
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
        dtype=jnp.dtype(cfg.dtype),
        rnn_cell=cfg.rnn_cell, rnn_unroll=cfg.rnn_unroll,
        mask_head=cfg.mask_head, pgenc_kernel=cfg.pgenc_kernel,
        stft_fold=cfg.stft_fold,
    )
    variables = jit_init(model, model.stft_shape, model.pgram_shape,
                         seed=cfg.seed, method=model.init_all)
    tx = make_optimizer(resolve_lr(cfg), optimizer, trainable=trainable,
                        params=variables["params"], flat=_flat_opt(cfg),
                        kernel=_opt_kernel(cfg, trainable, optimizer))
    return model, create_train_state(variables, tx)


def build_frames_model(cfg: RunConfig, batch_size: int, frame_size: int,
                       latent_channels: int = 16,
                       ) -> Tuple[AVFusionFramesModel, TrainState]:
    if cfg.mask_head and cfg.use_polar:
        raise SystemExit("--mask_head needs rectangular (re,im) STFT features; "
                         "drop --use_polar")
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionFramesModel(
        stft_shape=(batch_size, 2, t_stft, cfg.fft_len // 2 + 1),
        frame_shape=(batch_size, 1, cfg.num_frames, frame_size, frame_size),
        hops_per_frame=cfg.hops_per_frame, latent_channels=latent_channels,
        fc_size=cfg.fc_size, dtype=jnp.dtype(cfg.dtype),
        rnn_cell=cfg.rnn_cell, rnn_unroll=cfg.rnn_unroll,
        mask_head=cfg.mask_head, mask_mid_frame=(cfg.num_seq - 1) // 2,
    )
    variables = jit_init(model, model.stft_shape, model.frame_shape,
                         seed=cfg.seed, method=model.init_all)
    tx = make_optimizer(resolve_lr(cfg), "adam", flat=_flat_opt(cfg),
                        kernel=_opt_kernel(cfg))
    return model, create_train_state(variables, tx)


def make_stream(cfg: RunConfig, dataset, indices=None, mesh=None, seed: int = 0,
                stack: int = 1):
    """Batch stream for a train/val split: the C++ loader when requested and
    applicable (AV datasets), else the Python pipeline with thread prefetch.
    Shards each batch over the mesh when one is given. `stack > 1` groups
    that many consecutive batches into one [K, B, ...] dispatch batch
    (steps_per_dispatch)."""
    import numpy as np

    from maavss_tpu.data.dataset import AVDataset, Subset, batches, prefetch
    from maavss_tpu.parallel.mesh import shard_batch

    it = None
    if cfg.native_loader and isinstance(dataset, AVDataset) and dataset.mode == "av":
        try:
            from maavss_tpu.data.native_loader import NativeAVLoader

            it = iter(NativeAVLoader(dataset, cfg.batch_size, seed=seed,
                                     clip_indices=indices))
        except (RuntimeError, OSError) as e:
            print(f"native loader unavailable ({e}); using Python pipeline")
    if it is None:
        ds = dataset if indices is None else Subset(dataset, indices)
        it = prefetch(batches(ds, cfg.batch_size, seed=seed))
    if stack > 1:
        def stacked(src):
            while True:
                group = [next(src) for _ in range(stack)]
                yield jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]), *group)
        it = stacked(it)
    if mesh is not None:
        it = (shard_batch(mesh, b, stacked=stack > 1) for b in it)
    return it


def make_fusion_media_fn(model, cfg: RunConfig, out_dir: str):
    """Build a Trainer media callback for the fusion regime: separates the
    first clip of the current batch and writes STFT target/output panels +
    input/separated wavs (the reference's wandb media set, train.py:170-178).

    Opt-in (MAAVSS_MEDIA=1 in the entry scripts): the separator is an extra
    compiled program."""
    import numpy as np

    from maavss_tpu.exp.viz import save_audio, save_image, stft_pair_image
    from maavss_tpu.ops.stft import stft_features
    from maavss_tpu.train.infer import make_separator

    separate = make_separator(model, cfg)

    def media(state, batch, rng, step):
        one = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
        out = separate(state, one, rng)
        y = stft_features(jnp.asarray(one["audio"]), cfg.fft_len, cfg.hop,
                          normalized=cfg.normalize_fft, polar=cfg.use_polar)
        yh = stft_features(out["audio_out"], cfg.fft_len, cfg.hop,
                           normalized=cfg.normalize_fft, polar=cfg.use_polar)
        save_image(os.path.join(out_dir, f"stft_{step:07d}.png"),
                   stft_pair_image(np.asarray(y[0]), np.asarray(yh[0])))
        save_audio(os.path.join(out_dir, f"audio_in_{step:07d}.wav"),
                   np.asarray(one["audio"][0]), cfg.samplerate)
        save_audio(os.path.join(out_dir, f"audio_out_{step:07d}.wav"),
                   np.asarray(out["audio_out"][0]), cfg.samplerate)

    return media


def run_name(prefix: str, cfg: RunConfig) -> str:
    import time

    return f"{prefix}-{time.strftime('%Y%m%d-%H%M%S')}-s{cfg.seed}"
