"""--noise_schedule (annealed denoising curriculum) and the weighted
--mode_schedule random:<pa>,<pv>,<pav> curriculum — both quality levers the
reference lacks (its noise_std is flat, av_dataset.py:217-220, and its mode
draw is uniform, train_avse_frames.py:219).

Correctness anchors:
- schedule OFF: the compiled step keeps its historical 4-arg form (the
  constant folds before compilation — train/steps._jit_step), and matches
  the traced-noise step called with noise == cfg.noise_scalar exactly.
- schedule ON: one compile serves every annealed value (different noise
  values, no retrace); noise=0 vs large noise change the loss.
- resolve_noise_schedule endpoint/shape math; bad specs die loudly.
- the weighted mode draw respects degenerate probabilities and the config
  validator rejects malformed specs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.train.setup import resolve_noise_schedule
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_fusion_step

from tests.test_fusion_fullenc import CFG, build


def _state(vs, cfg):
    return create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(cfg.learning_rate, "sgd"))


# ---------------------------------------------------------------------------
# schedule math
# ---------------------------------------------------------------------------

def test_resolve_linear_endpoints():
    cfg = CFG.replace(noise_schedule="linear:0.3:0.1", epochs=1,
                      steps_per_epoch=11)
    fn = resolve_noise_schedule(cfg)
    assert fn(0) == pytest.approx(0.3)
    assert fn(5) == pytest.approx(0.2)
    assert fn(10) == pytest.approx(0.1)
    assert fn(99) == pytest.approx(0.1)  # clamped past the horizon


def test_resolve_cosine_endpoints():
    cfg = CFG.replace(noise_schedule="cosine:0.4:0.0", epochs=2,
                      steps_per_epoch=51)  # total-1 = 101
    fn = resolve_noise_schedule(cfg)
    assert fn(0) == pytest.approx(0.4)
    assert fn(101) == pytest.approx(0.0, abs=1e-12)
    # half-cosine midpoint = mean of the endpoints
    assert fn(101 // 2) == pytest.approx(0.2, abs=5e-3)
    # monotone non-increasing for hi -> lo
    vals = [fn(s) for s in range(0, 102, 10)]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def test_resolve_none_and_bad_specs():
    assert resolve_noise_schedule(CFG) is None
    with pytest.raises(SystemExit):
        resolve_noise_schedule(CFG.replace(noise_schedule="linear:0.3"))
    with pytest.raises(SystemExit):
        resolve_noise_schedule(CFG.replace(noise_schedule="geom:0.3:0.1"))


# ---------------------------------------------------------------------------
# step plumbing
# ---------------------------------------------------------------------------

def test_traced_noise_matches_static_at_default():
    """schedule ON + noise == cfg.noise_scalar must reproduce the historical
    constant-noise step exactly (same rng stream, same math)."""
    cfg = CFG
    model, vs = build(cfg, cfg.batch_size)
    batch = synthetic_av_batch(cfg, cfg.batch_size, seed=0)
    rng = jax.random.PRNGKey(3)

    step_static = make_fusion_step(model, cfg, window_mode="vectorized")
    s1, m1 = step_static(_state(vs, cfg), dict(batch), rng, jnp.int32(2))

    cfg_sched = cfg.replace(noise_schedule="linear:0.3:0.0")
    step_traced = make_fusion_step(model, cfg_sched, window_mode="vectorized")
    s2, m2 = step_traced(_state(vs, cfg), dict(batch), rng, jnp.int32(2),
                         jnp.float32(cfg.noise_scalar))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_traced_noise_values_change_loss_without_retrace():
    cfg = CFG.replace(noise_schedule="linear:0.5:0.0")
    model, vs = build(cfg, cfg.batch_size)
    batch = synthetic_av_batch(cfg, cfg.batch_size, seed=0)
    step = make_fusion_step(model, cfg, window_mode="vectorized")
    rng = jax.random.PRNGKey(3)

    _, m_hi = step(_state(vs, cfg), dict(batch), rng, jnp.int32(2),
                   jnp.float32(0.5))
    _, m_lo = step(_state(vs, cfg), dict(batch), rng, jnp.int32(2),
                   jnp.float32(0.0))
    # more input noise -> larger denoising loss at identical weights
    assert float(m_hi["loss"]) > float(m_lo["loss"])
    # omitted noise falls back to cfg.noise_scalar (legacy 4-arg call sites)
    _, m_def = step(_state(vs, cfg), dict(batch), rng, jnp.int32(2))
    _, m_exp = step(_state(vs, cfg), dict(batch), rng, jnp.int32(2),
                    jnp.float32(cfg.noise_scalar))
    assert float(m_def["loss"]) == pytest.approx(float(m_exp["loss"]),
                                                 rel=1e-6)


def test_traced_noise_composes_with_multistep():
    """--steps_per_dispatch x --noise_schedule: the K-dispatch shares one
    traced noise value (documented granularity, train/steps._multistep_noise)
    and matches K sequential single steps fed the same value."""
    cfg = CFG.replace(noise_schedule="linear:0.5:0.0")
    model, vs = build(cfg, cfg.batch_size)
    batches = [synthetic_av_batch(cfg, cfg.batch_size, seed=i) for i in (0, 1)]
    rng, mode, nz = jax.random.PRNGKey(7), jnp.int32(2), jnp.float32(0.23)

    step1 = make_fusion_step(model, cfg, window_mode="vectorized")
    s_seq = _state(vs, cfg)
    for i, b in enumerate(batches):
        s_seq, m_seq = step1(s_seq, dict(b), jax.random.fold_in(rng, i),
                             mode, nz)

    stepk = make_fusion_step(model, cfg, window_mode="vectorized", k_steps=2)
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    s_k, m_k = stepk(_state(vs, cfg), stacked, rng, mode, nz)

    np.testing.assert_allclose(float(m_seq["loss"]),
                               float(np.asarray(m_k["loss"])[-1]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# weighted mode curriculum
# ---------------------------------------------------------------------------

def test_mode_schedule_flag_parsing():
    cfg = model_args(["--mode_schedule", "random:1,0,3"])
    assert cfg.mode_schedule == "random:1,0,3"
    with pytest.raises(SystemExit):
        model_args(["--mode_schedule", "random:1,0"])
    with pytest.raises(SystemExit):
        model_args(["--mode_schedule", "bogus"])


def test_trainer_weighted_mode_draw():
    from maavss_tpu.train.trainer import Trainer

    cfg = CFG.replace(mode_freq=1, epochs=1, steps_per_epoch=1)
    model, vs = build(cfg, cfg.batch_size)
    state = _state(vs, cfg)
    tr = Trainer(cfg, step_fn=lambda *a: (state, {}), state=state,
                 run_name="t", mode_schedule="random:0,0,1")
    for e in range(5):
        tr.epoch = e
        tr._advance_mode()
        assert tr.mode == 2  # degenerate weights pin the draw
    tr2 = Trainer(cfg, step_fn=lambda *a: (state, {}), state=state,
                  run_name="t2", mode_schedule="random:1,1,1")
    draws = set()
    for e in range(60):
        tr2.epoch = e
        tr2._advance_mode()
        draws.add(tr2.mode)
    assert draws <= {0, 1, 2} and len(draws) >= 2

    with pytest.raises(ValueError):
        Trainer(cfg, step_fn=lambda *a: (state, {}), state=state,
                run_name="t3", mode_schedule="random:0,0,0")
