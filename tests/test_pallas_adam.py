"""Per-leaf fused Pallas Adam (train/fused_adam.py, ops/pallas_adam.py):
update-for-update parity with optax.adam on trees mixing kernel-eligible
leaves (lane-aligned fp32, incl. a ragged tail block) with jnp-fallback
leaves, the TrainState fused_apply path, the config gates, and the compiled
product step. CPU runs exercise the kernel in interpreter mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from maavss_tpu.ops.pallas_adam import adam_leaf_update, pallas_leaf_eligible
from maavss_tpu.train.fused_adam import pallas_adam


def _tree(seed=0):
    rng = np.random.default_rng(seed)

    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    return {
        "fc": {"kernel": a(256, 128)},      # eligible, exact block fit
        "tail": {"kernel": a(1500, 128)},   # eligible via _MIN_ELEMS... see below
        "conv": {"kernel": a(5, 5, 2, 8)},  # 400 elems -> jnp fallback
        "bn": {"scale": a(64,), "bias": a(64,)},  # fallback
    }


def test_eligibility_split():
    t = _tree()
    assert pallas_leaf_eligible(t["fc"]["kernel"])
    assert pallas_leaf_eligible(t["tail"]["kernel"])
    assert not pallas_leaf_eligible(t["conv"]["kernel"])
    assert not pallas_leaf_eligible(t["bn"]["scale"])
    assert not pallas_leaf_eligible(t["fc"]["kernel"].astype(jnp.bfloat16))


def test_leaf_update_matches_optax_all_shapes():
    """adam_leaf_update == one optax.adam step, leaf by leaf — including a
    grid with a ragged final block (1500 rows over 1024-row blocks)."""
    params = _tree(0)
    grads = jax.tree_util.tree_map(lambda x: 0.1 * jnp.sin(x), params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    c1 = jnp.float32(1.0 - 0.9)
    c2 = jnp.float32(1.0 - 0.999)
    for key in ("fc", "tail", "conv"):
        g = grads[key]["kernel"]
        p = params[key]["kernel"]
        m2, v2, p2 = adam_leaf_update(
            g, jnp.zeros_like(p), jnp.zeros_like(p), p, c1, c2,
            lr=1e-3, b1=0.9, b2=0.999, eps=1e-8)
        np.testing.assert_allclose(np.asarray(p2),
                                   np.asarray(p_ref[key]["kernel"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(0.1 * g),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(v2),
                                   np.asarray(0.001 * jnp.square(g)),
                                   rtol=1e-5, atol=1e-9)


def test_fused_apply_matches_optax_over_steps():
    """5 jitted TrainState steps: --opt_kernel pallas params track optax.adam
    to fp tolerance on every leaf."""
    from maavss_tpu.train.state import create_train_state

    params = _tree(1)
    variables = {"params": params}

    def run(tx):
        state = create_train_state(variables, tx)

        @jax.jit
        def step(state, g):
            return state.apply_gradients(grads=g)

        for i in range(5):
            g = jax.tree_util.tree_map(
                lambda x, i=i: 0.05 * jnp.cos(x * (i + 1)), state.params)
            state = step(state, g)
        return state

    s_ref = run(optax.adam(1e-3))
    s_pal = run(pallas_adam(1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_pal.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # moments track too (ScaleByAdamState lives at opt_state[0])
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(s_ref.opt_state[0].mu)[0]),
        np.asarray(jax.tree_util.tree_leaves(s_pal.opt_state.m)[0]),
        rtol=1e-6, atol=1e-7)
    assert int(s_pal.opt_state.count) == 5


def test_update_path_matches_fused_apply():
    """The plain optax-style update() (used when something other than
    TrainState drives the transformation) lands on the same params."""
    params = _tree(2)
    grads = jax.tree_util.tree_map(lambda x: 0.1 * jnp.tanh(x), params)
    tx = pallas_adam(1e-3)

    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    p_upd = optax.apply_updates(params, updates)
    p_fused, _ = tx.fused_apply(grads, tx.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(p_upd),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bf16_leaves_keep_dtype_and_track_optax():
    """The fusion tree has bf16 LSTM leaves (models/layers.py inits w_i/w_h
    in the compute dtype). 3 fused_apply steps must keep every leaf's dtype
    EXACTLY — an earlier version let the fp32 bias-correction arrays promote
    bf16 params to fp32 on step 1, after which the now-fp32 param hit the
    kernel path with a still-bf16 moment and the input_output_aliases dtype
    check failed on chip (runs/probe_r3c/bench_pallas_adam.err) — and track
    optax.adam, which applies the same moment/param-dtype casts."""
    rng = np.random.default_rng(4)
    params = {
        "lstm": {"w_i": jnp.asarray(
            rng.standard_normal((512, 128)).astype(np.float32), jnp.bfloat16)},
        "fc": {"kernel": jnp.asarray(
            rng.standard_normal((256, 128)).astype(np.float32))},
    }
    dtypes_before = jax.tree_util.tree_map(lambda x: x.dtype, params)

    def run(tx, fused):
        p = params
        st = tx.init(p)
        for i in range(3):
            g = jax.tree_util.tree_map(
                lambda x, i=i: (0.05 * jnp.cos(x.astype(jnp.float32)
                                               * (i + 1))).astype(x.dtype), p)
            if fused:
                p, st = tx.fused_apply(g, st, p)
            else:
                u, st = tx.update(g, st, p)
                p = optax.apply_updates(p, u)
        return p, st

    p_pal, st_pal = run(pallas_adam(1e-3), fused=True)
    p_ref, _ = run(optax.adam(1e-3), fused=False)

    assert jax.tree_util.tree_map(lambda x: x.dtype, p_pal) == dtypes_before
    assert jax.tree_util.tree_map(lambda x: x.dtype, st_pal.m) == dtypes_before
    assert jax.tree_util.tree_map(lambda x: x.dtype, st_pal.v) == dtypes_before
    np.testing.assert_allclose(
        np.asarray(p_pal["fc"]["kernel"]), np.asarray(p_ref["fc"]["kernel"]),
        rtol=1e-6, atol=1e-7)
    # bf16 leaf: same casts as optax, but lr is applied in a different
    # association order — allow one-ulp-of-bf16 drift
    np.testing.assert_allclose(
        np.asarray(p_pal["lstm"]["w_i"], np.float32),
        np.asarray(p_ref["lstm"]["w_i"], np.float32), rtol=1e-2, atol=1e-4)


def test_make_optimizer_pallas_gates():
    from maavss_tpu.config import RunConfig
    from maavss_tpu.train.setup import _opt_kernel
    from maavss_tpu.train.state import make_optimizer

    params = _tree(3)
    with pytest.raises(ValueError, match="adam only"):
        make_optimizer(1e-3, "sgd", kernel="pallas")
    with pytest.raises(ValueError, match="trainable"):
        make_optimizer(1e-3, "adam", trainable=("fc",), params=params,
                       kernel="pallas")
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_optimizer(1e-3, "adam", flat=True, kernel="pallas")
    with pytest.raises(ValueError, match="kernel"):
        make_optimizer(1e-3, "adam", kernel="cuda")
    with pytest.raises(SystemExit, match="mesh_model"):
        _opt_kernel(RunConfig(opt_kernel="pallas", mesh_model=2))
    with pytest.raises(SystemExit, match="fused_opt"):
        _opt_kernel(RunConfig(opt_kernel="pallas", fused_opt=True))
    assert _opt_kernel(RunConfig()) == "xla"  # auto -> measured winner
    assert _opt_kernel(RunConfig(opt_kernel="pallas")) == "pallas"


def test_pallas_adam_product_step_loss_matches():
    """The compiled fusion train step with --opt_kernel pallas tracks the
    optax step: identical losses for 3 steps on the same data."""
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.setup import build_fusion
    from maavss_tpu.train.steps import make_fusion_step

    losses = {}
    for kernel in ("xla", "pallas"):
        cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                        p_size=16, latent_chan=8, fc_size=256, batch_size=2,
                        opt_kernel=kernel)
        model, state = build_fusion(cfg, cfg.batch_size)
        step = make_fusion_step(model, cfg, window_mode="vectorized")
        batch = synthetic_av_batch(cfg, 2, seed=0)
        ls = []
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(7),
                                  jnp.int32(2))
            ls.append(float(metrics["loss"]))
        losses[kernel] = ls
    np.testing.assert_allclose(losses["pallas"], losses["xla"],
                               rtol=1e-5, atol=1e-7)


def test_pallas_adam_under_multistep_scan():
    """--opt_kernel pallas composes with --steps_per_dispatch (the fused
    kernel with input_output_aliases runs inside lax.scan): K=2 scanned
    matches 2 sequential steps."""
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.setup import build_fusion
    from maavss_tpu.train.steps import make_fusion_step

    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256, batch_size=2,
                    opt_kernel="pallas")
    model, state0 = build_fusion(cfg, cfg.batch_size)
    batch = synthetic_av_batch(cfg, 2, seed=0)
    rng = jax.random.PRNGKey(3)

    state_seq = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
        state0)
    step1 = make_fusion_step(model, cfg, window_mode="vectorized")
    seq_losses = []
    for i in range(2):
        state_seq, m = step1(state_seq, batch,
                             jax.random.fold_in(rng, i), jnp.int32(2))
        seq_losses.append(float(m["loss"]))

    stepk = make_fusion_step(model, cfg, window_mode="vectorized", k_steps=2)
    stacked = jax.tree_util.tree_map(lambda x: np.stack([x, x]), batch)
    state_k, mk = stepk(state0, stacked, rng, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(mk["loss"]), seq_losses, rtol=1e-5)
    # atol 1e-4: scanned and sequential are different compilations, and
    # Adam's m/(sqrt(v)+eps) amplifies grad-reassociation noise on
    # near-zero leaves — the XLA kernel shows the same ~5e-6 drift here
    for a, b in zip(jax.tree_util.tree_leaves(state_seq.params),
                    jax.tree_util.tree_leaves(state_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
