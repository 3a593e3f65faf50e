"""Flat fused optimizer (train/flat_opt.py): update-for-update parity with
optax.adam / optax.sgd on a ragged nested tree, plus the config gates."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from maavss_tpu.train.flat_opt import flat_adam, flat_sgd


def _tree(seed=0):
    rng = np.random.default_rng(seed)

    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    return {"enc": {"w": a(7, 33), "b": a(33)},
            "lstm": {"w_i": a(512, 1024), "w_h": a(256, 1024)},
            "head": {"k": a(5,)}}


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_flat_adam_matches_optax_adam():
    params = _tree(0)
    grads_seq = [jax.tree_util.tree_map(
        lambda x, i=i: 0.1 * jnp.sin(x + i), params) for i in range(5)]
    p_ref = _run(optax.adam(1e-3), params, grads_seq)
    p_flat = _run(flat_adam(1e-3), params, grads_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_flat_sgd_matches_optax_sgd():
    params = _tree(1)
    grads_seq = [jax.tree_util.tree_map(
        lambda x, i=i: 0.1 * jnp.cos(x * (i + 1)), params) for i in range(3)]
    for mom in (0.0, 0.9):
        p_ref = _run(optax.sgd(1e-2, momentum=mom or None), params, grads_seq)
        p_flat = _run(flat_sgd(1e-2, momentum=mom), params, grads_seq)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_flat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_fused_opt_product_step_loss_matches():
    """The compiled fusion train step with --fused_opt tracks the per-leaf
    Adam step: identical losses for 3 steps on the same data (tiny config)."""
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.setup import build_fusion
    from maavss_tpu.train.steps import make_fusion_step

    losses = {}
    for fused in (False, True):
        cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                        p_size=16, latent_chan=8, fc_size=256, batch_size=2,
                        fused_opt=fused)
        model, state = build_fusion(cfg, cfg.batch_size)
        step = make_fusion_step(model, cfg, window_mode="vectorized")
        batch = synthetic_av_batch(cfg, 2, seed=0)
        ls = []
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(7),
                                  jnp.int32(2))
            ls.append(float(metrics["loss"]))
        losses[fused] = ls
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-7)


def test_make_optimizer_flat_gates():
    import pytest

    from maavss_tpu.config import RunConfig
    from maavss_tpu.train.setup import _flat_opt
    from maavss_tpu.train.state import make_optimizer

    params = _tree(2)
    with pytest.raises(ValueError, match="fused_opt"):
        make_optimizer(1e-3, "adam", trainable=("enc",), params=params,
                       flat=True)
    with pytest.raises(ValueError, match="adam|sgd"):
        make_optimizer(1e-3, "adamw", flat=True)
    with pytest.raises(SystemExit, match="mesh_model"):
        _flat_opt(RunConfig(fused_opt=True, mesh_model=2))
    assert _flat_opt(RunConfig(fused_opt=True)) is True
    assert _flat_opt(RunConfig()) is False


def test_flat_adam_in_train_state_step():
    """End-to-end through TrainState.apply_gradients (donation-style reuse)
    and through a jitted step: flat and per-leaf Adam agree after 3 steps."""
    from maavss_tpu.train.state import TrainState, create_train_state

    params = _tree(3)
    variables = {"params": params}

    def one(tx):
        state = create_train_state(variables, tx)

        @jax.jit
        def step(state, g):
            return state.apply_gradients(grads=g)

        for i in range(3):
            g = jax.tree_util.tree_map(lambda x, i=i: 0.05 * jnp.sin(x * (i + 1)),
                                       state.params)
            state = step(state, g)
        return state.params

    p_ref = one(optax.adam(1e-3))
    p_flat = one(flat_adam(1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
