"""Train-step tests on a virtual 8-device CPU mesh (conftest.py forces
XLA_FLAGS=--xla_force_host_platform_device_count=8), covering:

- fusion regime (train.py semantics): windowed grad accumulation, modality
  curriculum without recompilation, sharded batch execution,
- frames regime (train_avse_frames.py middle-frame objective),
- audio-AE regime (train_autoencoder.py): loss decreases,
- staged training: optax-masked optimizer freezes AE params exactly like the
  reference grad toggles (train_av_net.py:73-75, avse_model.py:630-656).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.models.fusion_frames import AVFusionFramesModel
from maavss_tpu.parallel.mesh import make_mesh, shard_batch
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import (
    make_audio_ae_step,
    make_frames_step,
    make_fusion_middle_step,
    make_fusion_step,
    make_visual_ae_step,
)

CFG = RunConfig(
    num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64, p_size=16,
    latent_chan=8, fc_size=256, learning_rate=1e-3, framesize=48, batch_size=8,
)


def fusion_model_and_state(cfg, batch_size, lr=1e-3, trainable=None):
    t_stft = cfg.hops_per_frame * cfg.num_frames
    stft_shape = (batch_size, 2, t_stft, cfg.fft_len // 2)
    pgram_shape = (batch_size, 1, cfg.num_frames, cfg.p_size**2)
    model = AVFusionModel(
        stft_shape=stft_shape, pgram_shape=pgram_shape,
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
    )
    x_a = jnp.zeros(stft_shape)
    x_v = jnp.zeros(pgram_shape)
    variables = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    tx = make_optimizer(lr, "adam", trainable=trainable, params=variables["params"])
    return model, create_train_state(variables, tx)


def clone_state(state):
    """Fresh buffers: the compiled steps donate their state argument, so a
    fixture-held state must be copied per test."""
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x, state)


class TestFusionStep:
    @pytest.fixture(scope="class")
    def setup(self):
        mesh = make_mesh()
        model, state = fusion_model_and_state(CFG, CFG.batch_size)
        step = make_fusion_step(model, CFG, mesh=mesh)
        batch = shard_batch(mesh, synthetic_av_batch(CFG, CFG.batch_size, seed=0))
        return mesh, step, state, batch

    def test_runs_and_loss_finite(self, setup):
        _, step, state, batch = setup
        state, metrics = step(clone_state(state), batch, jax.random.PRNGKey(1), jnp.int32(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_mode_switch_no_recompile(self, setup):
        mesh, step, state, batch = setup
        state = clone_state(state)
        # one compiled fn handles all 3 curriculum modes (mode is traced)
        for mode in (0, 1, 2):
            state, metrics = step(state, batch, jax.random.PRNGKey(mode), jnp.int32(mode))
            assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow  # learning is asserted by AE/bf16/vectorized tests too
    def test_loss_decreases(self, setup):
        mesh, step, _, batch = setup
        _, state = fusion_model_and_state(CFG, CFG.batch_size, lr=3e-3)
        losses = []
        for i in range(12):
            state, metrics = step(state, batch, jax.random.PRNGKey(42), jnp.int32(2))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses


class TestFusionMiddleStep:
    def test_runs_all_modes(self):
        """experiments/train.py regime: middle-frame objective on the
        phasegram fusion model."""
        model, state = fusion_model_and_state(CFG, 4, lr=1e-3)
        step = make_fusion_middle_step(model, CFG)
        batch = synthetic_av_batch(CFG, 4, seed=2)
        for mode in (2, 0, 1):
            state, metrics = step(state, batch, jax.random.PRNGKey(0),
                                  jnp.int32(mode))
            assert np.isfinite(float(metrics["loss"]))


class TestBF16:
    @pytest.mark.slow
    def test_fusion_step_bf16_trains(self):
        """bfloat16 compute path (params stay fp32): step runs, loss finite
        and decreasing — the bench's production dtype."""
        cfg = CFG.replace(dtype="bfloat16")
        t_stft = cfg.hops_per_frame * cfg.num_frames
        model = AVFusionModel(
            stft_shape=(4, 2, t_stft, cfg.fft_len // 2),
            pgram_shape=(4, 1, cfg.num_frames, cfg.p_size**2),
            latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
            dtype=jnp.bfloat16)
        xa = jnp.zeros(model.stft_shape)
        xv = jnp.zeros(model.pgram_shape)
        variables = model.init(jax.random.PRNGKey(0), xa, xv, method=model.init_all)
        assert variables["params"]["fc1"]["kernel"].dtype == jnp.float32
        state = create_train_state(variables, make_optimizer(3e-3))
        step = make_fusion_step(model, cfg)
        batch = synthetic_av_batch(cfg, 4, seed=0)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.int32(2))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1]) and losses[-1] < losses[0], losses


class TestStagedTraining:
    def test_masked_optimizer_freezes_aes(self):
        """train_av_net regime: only fusion subnets receive updates."""
        trainable = ("lstm", "fc1", "fc2", "a_fc1", "v_fc1")
        model, state = fusion_model_and_state(CFG, 4, lr=1e-2, trainable=trainable)
        step = make_fusion_step(model, CFG)
        batch = synthetic_av_batch(CFG, 4, seed=1)
        # explicit copies: the step donates `state`, so zero-copy views of the
        # CPU buffers would alias reused memory after the call
        before = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), state.params)
        state, _ = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
        after = state.params
        for name in ("stft_encoder", "phasegram_encoder"):
            frozen_same = jax.tree_util.tree_all(
                jax.tree_util.tree_map(
                    lambda a, b: bool(np.allclose(a, b)), before[name], after[name]
                )
            )
            assert frozen_same, f"{name} params changed despite mask"
        moved = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(np.any(a != b)), before["lstm"], after["lstm"]
            )
        )
        assert moved, "lstm params did not update"


class TestFramesStep:
    def test_runs(self):
        # tiny geometry: the 3D-conv visual encoder is compile-heavy on CPU
        cfg = CFG.replace(num_frames=2, num_seq=2, framesize=24)
        t_stft = cfg.hops_per_frame * cfg.num_frames
        bsz = 4
        stft_shape = (bsz, 2, t_stft, cfg.fft_len // 2 + 1)
        frame_shape = (bsz, 1, cfg.num_frames, cfg.framesize, cfg.framesize)
        model = AVFusionFramesModel(
            stft_shape=stft_shape, frame_shape=frame_shape,
            hops_per_frame=cfg.hops_per_frame, latent_channels=8,
        )
        x_a = jnp.zeros(stft_shape)
        x_v = jnp.zeros(frame_shape)
        variables = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
        tx = make_optimizer(1e-3, "adam")
        state = create_train_state(variables, tx)
        step = make_frames_step(model, cfg)
        batch = synthetic_av_batch(cfg, bsz, seed=0, frame_size=cfg.framesize)
        for mode in (2, 0, 1):
            state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(mode))
            assert np.isfinite(float(metrics["loss"]))


class TestAEsSteps:
    def test_audio_ae_loss_decreases(self):
        model, state = fusion_model_and_state(CFG, 8, lr=3e-3)
        step = make_audio_ae_step(model, CFG)
        batch = {"audio": synthetic_av_batch(CFG, 8, seed=3)["audio"]}
        losses = []
        for _ in range(15):
            state, metrics = step(state, batch, jax.random.PRNGKey(7), jnp.int32(2))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_visual_ae_runs(self):
        model, state = fusion_model_and_state(CFG, 8, lr=1e-3)
        step = make_visual_ae_step(model, CFG)
        batch = {"frames": synthetic_av_batch(CFG, 8, seed=4)["frames"]}
        state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
        assert np.isfinite(float(metrics["loss"]))


def test_remat_step_matches_plain():
    """--remat (jax.checkpoint around the windowed forward) must not change
    the math — same loss and same updated params as the plain step."""
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_fusion_step

    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                    batch_size=2)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(2, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(2, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_av_batch(cfg, 2, seed=0))
    rng = jax.random.PRNGKey(0)

    import os

    outs = {}
    # (remat, MAAVSS_REMAT_POLICY): plain, save-nothing, save-dots — the
    # policy picks what the backward recomputes, never the values
    for key, remat, policy in (("plain", False, None), ("full", True, "full"),
                               ("dots", True, "dots")):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, vs),
            make_optimizer(cfg.learning_rate, "adam"))
        if policy is not None:
            os.environ["MAAVSS_REMAT_POLICY"] = policy
        try:
            step = make_fusion_step(model, cfg.replace(remat=remat))
            state, metrics = step(state, batch, rng, jnp.int32(2))
        finally:
            os.environ.pop("MAAVSS_REMAT_POLICY", None)
        outs[key] = (float(metrics["loss"]), state.params)

    for key in ("full", "dots"):
        assert outs["plain"][0] == pytest.approx(outs[key][0], rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(outs["plain"][1]),
                        jax.tree_util.tree_leaves(outs[key][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_frames_microbatch_matches_monolithic():
    """--microbatch (scan-accumulated batch chunks in the frames step) on a
    batch whose two chunks are identical copies must match the monolithic
    step exactly: duplicating examples changes neither BatchNorm batch stats
    nor the mse, so per-chunk stats == full-batch stats and the averaged
    chunk grads == the full-batch grads (up to fp reassociation)."""
    cfg = CFG.replace(num_frames=2, num_seq=2, framesize=24)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    bsz = 4
    stft_shape = (bsz, 2, t_stft, cfg.fft_len // 2 + 1)
    frame_shape = (bsz, 1, cfg.num_frames, cfg.framesize, cfg.framesize)
    model = AVFusionFramesModel(
        stft_shape=stft_shape, frame_shape=frame_shape,
        hops_per_frame=cfg.hops_per_frame, latent_channels=8,
    )
    x_a = jnp.zeros(stft_shape)
    x_v = jnp.zeros(frame_shape)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    half = synthetic_av_batch(cfg, bsz // 2, seed=0, frame_size=cfg.framesize)
    # identical chunks: [c, c] — chunk 0 == chunk 1 under reshape(M, B/M)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}
    rng = jax.random.PRNGKey(0)

    # the noise draw in _prep_stft_pair is per-ELEMENT, which would break the
    # duplicated-chunk identity; zero it for exactness
    cfg = cfg.replace(noise_scalar=0.0)

    outs = {}
    for mb in (1, 2):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, vs),
            make_optimizer(cfg.learning_rate, "sgd"))
        step = make_frames_step(model, cfg.replace(microbatch=mb))
        state, metrics = step(state, batch, rng, jnp.int32(2))
        outs[mb] = (float(metrics["loss"]), state.params)

    assert outs[1][0] == pytest.approx(outs[2][0], rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][1]),
                    jax.tree_util.tree_leaves(outs[2][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_frames_microbatch_rejects_indivisible_batch():
    cfg = CFG.replace(num_frames=2, num_seq=2, framesize=24, microbatch=3)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    stft_shape = (4, 2, t_stft, cfg.fft_len // 2 + 1)
    frame_shape = (4, 1, cfg.num_frames, cfg.framesize, cfg.framesize)
    model = AVFusionFramesModel(
        stft_shape=stft_shape, frame_shape=frame_shape,
        hops_per_frame=cfg.hops_per_frame, latent_channels=8,
    )
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros(stft_shape),
                    jnp.zeros(frame_shape), method=model.init_all)
    state = create_train_state(vs, make_optimizer(1e-3, "adam"))
    step = make_frames_step(model, cfg)
    batch = synthetic_av_batch(cfg, 4, seed=0, frame_size=cfg.framesize)
    with pytest.raises(ValueError, match="microbatch"):
        step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))


@pytest.mark.parametrize("window_mode", ["scan", "vectorized"])
def test_fusion_microbatch_matches_monolithic(window_mode):
    """--microbatch on the fusion regimes (both window modes), duplicated
    chunks: per-chunk BatchNorm stats and phasegram max-norms equal the
    full-batch ones, so grads/params must match the monolithic step."""
    cfg = CFG.replace(batch_size=4, noise_scalar=0.0)
    rng = jax.random.PRNGKey(0)
    half = synthetic_av_batch(cfg, 2, seed=0)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}

    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(4, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(4, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros(model.stft_shape),
                    jnp.zeros(model.pgram_shape), method=model.init_all)

    outs = {}
    for mb in (1, 2):
        # sgd: adam's first step is ~lr*sign(grad), which amplifies fp
        # reassociation noise on near-zero grads (same rationale as
        # __graft_entry__'s equivalence check)
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, vs),
            make_optimizer(cfg.learning_rate, "sgd"))
        step = make_fusion_step(model, cfg.replace(microbatch=mb),
                                window_mode=window_mode)
        state, metrics = step(state, batch, rng, jnp.int32(2))
        outs[mb] = (float(metrics["loss"]), state.params)

    assert outs[1][0] == pytest.approx(outs[2][0], rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][1]),
                    jax.tree_util.tree_leaves(outs[2][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fusion_middle_microbatch_runs():
    cfg = CFG.replace(batch_size=4, microbatch=2)
    model, state = fusion_model_and_state(cfg, 4)
    step = make_fusion_middle_step(model, cfg)
    batch = synthetic_av_batch(cfg, 4, seed=0)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.int32(2))
    assert np.isfinite(float(metrics["loss"]))
