"""--lr_schedule: optax schedules through make_optimizer (VERDICT r3 #8).

The reference trains at a flat LR for the whole run (train.py:55 — a bare
`optim.Adam(..., lr=config.learning_rate)`); cosine/warmup schedules are a
quality lever it lacks. These tests pin the schedule shapes and the guard
rails; the on-chip quality A/B lives in BASELINE.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from maavss_tpu.config import RunConfig, build_parser
from maavss_tpu.train.setup import resolve_lr
from maavss_tpu.train.state import make_optimizer


def _cfg(**kw):
    cfg = RunConfig(**kw)
    return cfg


def test_constant_is_float():
    assert resolve_lr(_cfg(learning_rate=3e-4)) == 3e-4


def test_cosine_endpoints():
    cfg = _cfg(learning_rate=1e-3, lr_schedule="cosine", epochs=4,
               steps_per_epoch=25, lr_final_scale=0.1)
    sched = resolve_lr(cfg)
    assert callable(sched)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    # monotone decreasing between the endpoints
    vals = [float(sched(s)) for s in (0, 25, 50, 75, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_warmup_cosine_ramp_and_peak():
    cfg = _cfg(learning_rate=1e-3, lr_schedule="warmup_cosine", epochs=4,
               steps_per_epoch=25, warmup_steps=10)
    sched = resolve_lr(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(100)) < 1e-5  # decays toward end_value=0


def test_warmup_default_is_five_percent():
    cfg = _cfg(learning_rate=1e-3, lr_schedule="warmup_cosine", epochs=4,
               steps_per_epoch=100)  # warmup_steps=0 -> total//20 = 20
    sched = resolve_lr(cfg)
    np.testing.assert_allclose(float(sched(20)), 1e-3, rtol=1e-6)
    assert float(sched(10)) < 1e-3


def test_schedule_updates_shrink_with_lr():
    """Adam under a schedule actually scales its updates by sched(step)."""
    cfg = _cfg(learning_rate=1e-2, lr_schedule="cosine", epochs=1,
               steps_per_epoch=10, lr_final_scale=0.0)
    tx = make_optimizer(resolve_lr(cfg), "adam")
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    u0, state = tx.update(grads, state, params)
    for _ in range(8):
        u, state = tx.update(grads, state, params)
    # Adam's normalized update is ~lr*sign(g); step 9 LR is ~2.4% of peak
    assert float(jnp.abs(u["w"]).mean()) < 0.2 * float(jnp.abs(u0["w"]).mean())


def test_schedule_rejects_fused_kernels():
    cfg = _cfg(learning_rate=1e-3, lr_schedule="cosine")
    sched = resolve_lr(cfg)
    with pytest.raises(ValueError, match="lr_schedule"):
        make_optimizer(sched, "adam", flat=True)
    with pytest.raises(ValueError, match="lr_schedule"):
        make_optimizer(sched, "adam", kernel="pallas")


def test_parser_flags_roundtrip():
    p = build_parser()
    ns = p.parse_args(["--lr_schedule", "warmup_cosine", "--warmup_steps",
                       "7", "--lr_final_scale", "0.05"])
    assert ns.lr_schedule == "warmup_cosine"
    assert ns.warmup_steps == 7
    assert ns.lr_final_scale == 0.05
