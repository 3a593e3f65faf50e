"""Parity tests for the fused phasegram-encoder kernels (ops/pallas_pgenc.py
+ models/layers.PallasConvStack1x9) against the XLA ConvStack reference.

Interpret-mode only (CPU conftest): proves the math — value parity, gradient
parity through the hand-written VJP, checkpoint interchange (identical param
trees). The on-chip lowering/latency question is benchmarks/mosaic_probe.py's
job (BASELINE.md round 3c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maavss_tpu.models.layers import ConvStack, PallasConvStack1x9
from maavss_tpu.models.shape_plan import ConvSpec, plan_phasegram_encoder


def specs3():
    return (
        ConvSpec(1, 2, (1, 9), (1, 2), (0, 4), act="tanh"),
        ConvSpec(2, 4, (1, 9), (1, 2), (0, 4), act="tanh"),
        ConvSpec(4, 8, (1, 9), (1, 2), (0, 4), act="tanh"),
    )


def make_x(b=2, t=8, s=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, 1, t, s)), jnp.float32)


def tree_allclose(a, b, atol=1e-5, rtol=1e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        kk = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(flat_b[kk]), atol=atol, rtol=rtol,
            err_msg=kk)


def test_param_tree_identical():
    """Same names, shapes AND init values as ConvStack (rng folds by path),
    so checkpoints interchange and --pgenc_kernel is a pure compute switch."""
    x = make_x()
    key = jax.random.PRNGKey(3)
    v_ref = ConvStack(specs3()).init(key, x)
    v_fused = PallasConvStack1x9(specs3()).init(key, x)
    tree_allclose(v_ref, v_fused, atol=0, rtol=0)


def test_train_forward_and_stats_parity():
    x = make_x()
    key = jax.random.PRNGKey(0)
    variables = ConvStack(specs3()).init(key, x)
    y_ref, mut_ref = ConvStack(specs3()).apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    y_f, mut_f = PallasConvStack1x9(specs3()).apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)
    tree_allclose(mut_f["batch_stats"], mut_ref["batch_stats"],
                  atol=1e-5, rtol=1e-4)


def test_eval_forward_parity_with_nontrivial_running_stats():
    x = make_x()
    key = jax.random.PRNGKey(1)
    variables = ConvStack(specs3()).init(key, x)
    # run a train pass to move the running stats off their init values
    _, mut = ConvStack(specs3()).apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    y_ref = ConvStack(specs3()).apply(x=x, train=False, variables=variables)
    y_f = PallasConvStack1x9(specs3()).apply(
        x=x, train=False, variables=variables)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_gradient_parity():
    """The hand-written VJP matches XLA autodiff through the full stack, for
    both the parameters and the input. Conv biases get exactly-zero grads
    from the kernel (their true gradient under train-mode BN; flax returns
    fp noise ~1e-8)."""
    x = make_x()
    key = jax.random.PRNGKey(2)
    variables = ConvStack(specs3()).init(key, x)
    tgt = make_x(seed=9)[:, :1, :, :8] * 0.1  # [B,1? -> broadcastable target]

    def loss(module):
        def f(params, xx):
            y, _ = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y - tgt[:, :, : y.shape[2], : y.shape[3]]))
        return f

    g_ref, gx_ref = jax.grad(loss(ConvStack(specs3())), argnums=(0, 1))(
        variables["params"], x)
    g_f, gx_f = jax.grad(loss(PallasConvStack1x9(specs3())), argnums=(0, 1))(
        variables["params"], x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               atol=3e-5, rtol=1e-3)
    for i in range(3):
        ref = g_ref[f"Conv_{i}"]["kernel"]
        got = g_f[f"Conv_{i}"]["kernel"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-3, err_msg=f"Conv_{i}")
        assert np.all(np.asarray(g_f[f"Conv_{i}"]["bias"]) == 0.0)
        assert np.max(np.abs(np.asarray(g_ref[f"Conv_{i}"]["bias"]))) < 1e-5
        bn_ref = g_ref[f"TorchBatchNorm_{i}"]["BatchNorm_0"]
        bn_got = g_f[f"TorchBatchNorm_{i}"]["BatchNorm_0"]
        np.testing.assert_allclose(np.asarray(bn_got["scale"]),
                                   np.asarray(bn_ref["scale"]),
                                   atol=3e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(bn_got["bias"]),
                                   np.asarray(bn_ref["bias"]),
                                   atol=3e-5, rtol=1e-3)


def test_strided_tap_mode_matches_dense():
    x = make_x()
    key = jax.random.PRNGKey(4)
    variables = PallasConvStack1x9(specs3()).init(key, x)
    y_d, mut_d = PallasConvStack1x9(specs3(), tap_mode="dense").apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    y_s, mut_s = PallasConvStack1x9(specs3(), tap_mode="strided").apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                               atol=1e-6, rtol=1e-6)
    tree_allclose(mut_s["batch_stats"], mut_d["batch_stats"],
                  atol=1e-6, rtol=1e-6)


def test_odd_row_count():
    """B*T that is not a power of two still blocks correctly (halving row
    blocks hit a divisor, floor 1)."""
    x = make_x(b=3, t=6)
    key = jax.random.PRNGKey(5)
    variables = ConvStack(specs3()).init(key, x)
    y_ref, _ = ConvStack(specs3()).apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    y_f, _ = PallasConvStack1x9(specs3()).apply(
        x=x, train=True, mutable=["batch_stats"], variables=variables)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_full_planned_stack_smoke():
    """The real planned geometry (tiny batch): all ten layers compile and the
    latent shape matches the plan."""
    pgram_shape = (1, 1, 8, 4096)
    specs, (t, s) = plan_phasegram_encoder(pgram_shape, 64, 4096)
    x = jnp.zeros(pgram_shape, jnp.float32)
    m = PallasConvStack1x9(tuple(specs))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables=variables, x=x, train=False)
    assert y.shape == (1, 64, t, s)


def test_pgenc_pallas_raises_on_tpu(monkeypatch):
    """On TPU the flag is a documented gate, not a crash deep in Mosaic:
    the compiler rejects every stride-2 subsample formulation
    (runs/probe_r3d/mosaic_probe2.json; BASELINE.md round 3d)."""
    import jax as jax_mod

    from maavss_tpu.models.fusion import AVFusionModel

    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    m = AVFusionModel(stft_shape=(2, 2, 32, 16), pgram_shape=(2, 1, 4, 64),
                      latent_channels=8, fc_size=256, pgenc_kernel="pallas")
    with pytest.raises(ValueError, match="Mosaic"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 2, 32, 16)),
               jnp.zeros((2, 1, 4, 64)), method=m.init_all)


def test_fusion_model_pgenc_pallas_matches_xla():
    """--pgenc_kernel pallas is a pure compute-path switch on AVFusionModel:
    same variables, matching forward."""
    from maavss_tpu.models.fusion import AVFusionModel

    stft_shape = (2, 2, 32, 16)
    pgram_shape = (2, 1, 4, 64)
    kw = dict(stft_shape=stft_shape, pgram_shape=pgram_shape,
              latent_channels=8, fc_size=256)
    x_a = jnp.asarray(np.random.default_rng(0).normal(size=stft_shape),
                      jnp.float32)
    x_v = jnp.asarray(np.random.default_rng(1).normal(size=pgram_shape),
                      jnp.float32)
    m_x = AVFusionModel(**kw, pgenc_kernel="xla")
    m_p = AVFusionModel(**kw, pgenc_kernel="pallas")
    variables = m_x.init(jax.random.PRNGKey(0), x_a, x_v,
                         method=m_x.init_all)
    out_x = m_x.apply(variables, x_a, x_v)
    out_p = m_p.apply(variables, x_a, x_v)
    for a, b in zip(out_p, out_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_fusion_train_step_pgenc_parity():
    """One full windowed optimizer step (make_fusion_step: STFT prep, window
    scan, value_and_grad through the fused VJP, Adam update) matches the XLA
    path on identical state/batch/rng."""
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_fusion_step

    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256, batch_size=4)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    kw = dict(stft_shape=(4, 2, t_stft, cfg.fft_len // 2),
              pgram_shape=(4, 1, cfg.num_frames, cfg.p_size**2),
              latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    m_x = AVFusionModel(**kw, pgenc_kernel="xla")
    m_p = AVFusionModel(**kw, pgenc_kernel="pallas")
    variables = m_x.init(jax.random.PRNGKey(0), jnp.zeros(kw["stft_shape"]),
                         jnp.zeros(kw["pgram_shape"]), method=m_x.init_all)

    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_av_batch(cfg, 4))
    rng = jax.random.PRNGKey(7)
    results = {}
    for name, model in (("xla", m_x), ("pallas", m_p)):
        tx = make_optimizer(1e-3, "adam", params=variables["params"])
        state = create_train_state(
            jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                   variables), tx)
        step = make_fusion_step(model, cfg)
        new_state, metrics = step(state, batch, rng, jnp.int32(2))
        results[name] = (new_state.params, metrics["loss"])
    np.testing.assert_allclose(float(results["pallas"][1]),
                               float(results["xla"][1]),
                               atol=1e-6, rtol=1e-5)

    # The pgenc conv biases are excluded: their true gradient under
    # train-mode BN is identically zero (the kernel returns exact zeros, so
    # Adam leaves them alone), while XLA autodiff returns ~1e-9 fp noise that
    # Adam amplifies to full-lr sign steps. The fused path's behavior is the
    # mathematically correct one; the values can't match by construction.
    def drop_pgenc_bias(params):
        # tree_map rebuilds the containers, so the pops don't mutate the input
        params = jax.tree_util.tree_map(lambda v: v, params)
        for mod in params["phasegram_encoder"].values():
            mod.pop("bias", None)
        return params

    tree_allclose(drop_pgenc_bias(results["pallas"][0]),
                  drop_pgenc_bias(results["xla"][0]),
                  atol=5e-5, rtol=5e-3)
    for name, mod in results["pallas"][0]["phasegram_encoder"].items():
        if name.startswith("Conv_") and "bias" in mod:
            np.testing.assert_array_equal(
                np.asarray(mod["bias"]),
                np.asarray(variables["params"]["phasegram_encoder"][name]["bias"]))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
