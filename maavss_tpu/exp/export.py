"""Serving export: portable compiled-separator artifacts via jax.export.

The reference has no serving story at all — inference means re-running the
training-era Python stack (avse_model.py + ad-hoc scripts). For production
TPU serving this module exports the windowed separator to a serialized
StableHLO artifact (`jax.export`): build ONCE on any host (CPU build machines
included — the artifact carries lowerings for every platform requested),
ship bytes, then `deserialize(...).call(params, batch_stats, audio, visual)`
on the serving fleet with no flax/model code installed. Weights stay call
arguments (artifact and checkpoint deploy independently); the artifact pins
geometry + feature flags in a JSON sidecar so mismatched checkpoints fail
loudly instead of silently degrading.

Unlike the eval separators (train/infer.py), which synthesize the mixture by
injecting noise into a clean source and score SI-SDR against it, the serving
function receives the mixture directly (noise_scalar forced to 0) and returns
only the separated waveform.

Caveat: backend-adaptive kernel gates (e.g. the auto Pallas polar iSTFT,
ops/stft.py) resolve at TRACE time on the exporting host — an artifact built
on a CPU host carries the XLA path even for its TPU lowering. Export on a
TPU-attached host when the Pallas variants matter (the measured deltas are
small: −12.5% on the iSTFT conversion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from maavss_tpu.config import RunConfig

ARTIFACT_SUFFIX = ".jaxexport"
_META_SUFFIX = ".json"

# cfg fields an artifact's checkpoint must agree on (shape- or
# feature-semantics-changing; see train/infer.py feature prep)
_GEOMETRY_FIELDS = (
    "fft_len", "hop", "hops_per_frame", "num_frames", "num_seq", "p_size",
    "framesize", "samplerate", "latent_chan", "fc_size", "use_polar",
    "normalize_fft",
    "normalize_output_fft", "mask_head", "rnn_cell", "pgram_cache",
    "frames_encode", "fusion_encode",
)


def make_serving_fn(model, cfg: RunConfig, frames_model: bool = False):
    """Mixture-in → separated-audio-out, positional-args-only (export-ready).

    Signature: fn(params, batch_stats, audio [B, S_total], visual) where
    visual is frames [B, T_total, p, p] (or raw frames for the frames model),
    or precomputed phasegram rows [B, T_total, p²] when cfg.pgram_cache.
    """
    from maavss_tpu.train.infer import make_frames_separator, make_separator
    from maavss_tpu.train.state import TrainState

    serve_cfg = cfg.replace(noise_scalar=0.0)
    sep = (make_frames_separator if frames_model else make_separator)(
        model, serve_cfg)
    visual_key = "pgram" if (cfg.pgram_cache and not frames_model) else "frames"
    rng = jax.random.PRNGKey(0)  # unused: zero noise

    def serving_fn(params, batch_stats, audio, visual):
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=(), tx=None)
        out = sep(state, {"audio": audio, visual_key: visual}, rng)
        return out["audio_out"]

    return serving_fn


def serving_input_specs(cfg: RunConfig, batch: int, frames_model: bool = False,
                        dtype=jnp.float32) -> Tuple[Any, Any]:
    """ShapeDtypeStructs for (audio, visual) at the sweep's clip geometry."""
    t_total = cfg.num_frames + cfg.num_seq
    s_total = cfg.hop * cfg.hops_per_frame * t_total
    audio = jax.ShapeDtypeStruct((batch, s_total), dtype)
    if frames_model:
        # uint8 wire format, converted on device (frames_f32) — same as the
        # training input path. The fp32 spec cost 4x the request bytes and
        # dominated serving latency through the relay (a [8,11,256,256]
        # frames tensor is ~23 MB fp32; BASELINE.md round 3d serving table).
        visual = jax.ShapeDtypeStruct(
            (batch, t_total, cfg.framesize, cfg.framesize), jnp.uint8)
    elif cfg.pgram_cache:
        visual = jax.ShapeDtypeStruct((batch, t_total, cfg.p_size**2),
                                      jnp.float16)
    else:
        visual = jax.ShapeDtypeStruct((batch, t_total, cfg.p_size, cfg.p_size),
                                      dtype)
    return audio, visual


def random_serving_inputs(cfg: RunConfig, batch: int,
                          frames_model: bool = False, seed: int = 0):
    """(audio, visual) numpy request payloads at the serving specs, scaled
    correctly per dtype (uint8 frames get [0,255], floats get small
    gaussians) — shared by serve_bench / export selftest / tests so a spec
    dtype change cannot silently produce all-zero visuals."""
    import numpy as np

    a_spec, v_spec = serving_input_specs(cfg, batch, frames_model=frames_model)
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal(a_spec.shape) * 0.1).astype(a_spec.dtype)
    if np.issubdtype(v_spec.dtype, np.integer):
        visual = rng.integers(0, 256, v_spec.shape).astype(v_spec.dtype)
    else:
        visual = (rng.standard_normal(v_spec.shape) * 0.1).astype(v_spec.dtype)
    return audio, visual


def export_separator(model, cfg: RunConfig, variables: Dict[str, Any],
                     batch: int, platforms: Sequence[str] = ("tpu", "cpu"),
                     frames_model: bool = False) -> bytes:
    """Serialize the compiled separator for `platforms` (default: build
    anywhere, serve on TPU with a CPU fallback)."""
    from jax import export as jax_export

    fn = make_serving_fn(model, cfg, frames_model=frames_model)
    audio_spec, visual_spec = serving_input_specs(
        cfg, batch, frames_model=frames_model)
    p_spec, b_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (variables["params"], variables.get("batch_stats", {})))
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        p_spec, b_spec, audio_spec, visual_spec)
    return exported.serialize()


def save_artifact(path: str, data: bytes, cfg: RunConfig, batch: int,
                  platforms: Sequence[str], frames_model: bool) -> str:
    """Write artifact bytes + the JSON sidecar; returns the artifact path."""
    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    meta = {
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": int(batch),
        "frames_model": bool(frames_model),
        "geometry": {k: getattr(cfg, k) for k in _GEOMETRY_FIELDS},
    }
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_artifact(path: str, cfg: Optional[RunConfig] = None):
    """Deserialize an exported separator; returns (exported, meta).

    `exported.call(params, batch_stats, audio, visual)` runs it. When `cfg`
    is given, geometry fields are cross-checked against the sidecar and a
    mismatch raises (a wrong-geometry checkpoint would otherwise fail deep
    inside XLA with a shape error, or worse, run with wrong semantics)."""
    from jax import export as jax_export

    if not path.endswith(ARTIFACT_SUFFIX) and not os.path.exists(path):
        path = path + ARTIFACT_SUFFIX
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict[str, Any] = {}
    if os.path.exists(path + _META_SUFFIX):
        with open(path + _META_SUFFIX) as f:
            meta = json.load(f)
    if cfg is not None and meta.get("geometry"):
        mismatches = {
            k: (meta["geometry"][k], str(getattr(cfg, k)))
            for k in _GEOMETRY_FIELDS
            if k in meta["geometry"]
            and str(meta["geometry"][k]) != str(getattr(cfg, k))
        }
        if mismatches:
            raise ValueError(
                f"artifact geometry mismatch vs run config: {mismatches} "
                f"(artifact: {path + _META_SUFFIX})")
    return exported, meta


def np_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Host copies of params/batch_stats for feeding a deserialized artifact
    from a process with no accelerator."""
    return jax.tree_util.tree_map(np.asarray, variables)
