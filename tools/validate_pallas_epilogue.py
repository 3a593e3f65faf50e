#!/usr/bin/env python
"""Validate the fused BN+phase-max+leaky epilogue ON HARDWARE.

Cross-lowering CI (tests/test_mosaic_lowering.py) proves the Mosaic lowering
accepts the kernels, but not that the Mosaic BACKEND compiles them (layout
inference killed the r3c reshape-split subsample after a clean lowering) nor
that the compiled code is correct. This runs fused vs the unfused XLA tail
at the real product stage geometries (C=16/32/64 — stages 1/2/3) on the
attached chip, forward values AND the full vjp, and prints one JSON line per
geometry. Run inside a relay window, one TPU client at a time.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from maavss_tpu.models.layers import (
        batchnorm_view_to_phase_channels,
        phase_channels_to_batchnorm_view,
        phase_max_2x2,
    )
    from maavss_tpu.ops.pallas_epilogue import fused_bn_phasemax_leaky
    from maavss_tpu.train.setup import init_runtime

    init_runtime()

    def xla_tail(y, gamma, beta):
        yv = phase_channels_to_batchnorm_view(y).astype(jnp.float32)
        mu = jnp.mean(yv, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(yv), axis=(0, 1, 2, 3)) - jnp.square(mu)
        yn = (yv - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        yn = batchnorm_view_to_phase_channels(yn)
        out = jnp.where(yn >= 0, yn, 0.01 * yn)
        return phase_max_2x2(out).astype(y.dtype), mu, var

    def loss(tail, w1):
        def f(y, gamma, beta):
            out, mu, var = tail(y, gamma, beta)
            return (jnp.sum(out.astype(jnp.float32) * w1)
                    + jnp.sum(mu) + 0.5 * jnp.sum(var))
        return f

    def golden_dy(y, gamma, beta, w1):
        """fp64 numpy dy under the kernel's DOCUMENTED semantics — the
        first-match tie rule (pallas_epilogue.py docstring). The XLA tail
        splits tied pool gradients evenly instead, and in bf16 ties are
        common (8-bit mantissa), so the fused-vs-XLA dy diff (~3e-2 rel,
        runs/probe_r4b/validate2.json) is tie ROUTING, not math error:
        against this golden the fused dy must match to rounding noise."""
        yf = np.asarray(y, np.float64)
        b, t, h, w, c4 = yf.shape
        c = c4 // 4
        ph = yf.reshape(b, t, h, w, 4, c)
        gam = np.asarray(gamma, np.float64)
        bet = np.asarray(beta, np.float64)
        n = 4.0 * b * t * h * w
        mu = ph.mean(axis=(0, 1, 2, 3, 4))
        var = (ph * ph).mean(axis=(0, 1, 2, 3, 4)) - mu * mu
        rstd = 1.0 / np.sqrt(var + 1e-5)
        sel = np.where(gam > 0, ph.max(axis=4), ph.min(axis=4))
        hit = np.cumsum(ph == sel[:, :, :, :, None, :], axis=4) \
            * (ph == sel[:, :, :, :, None, :])
        first = hit == 1  # first tied phase takes the full gradient
        xhat_sel = (sel - mu) * rstd
        o_bn = gam * xhat_sel + bet
        # g_out = w1 cast through the out dtype (the loss casts out to f32)
        g = np.asarray(jnp.asarray(w1).astype(y.dtype), np.float64)
        dsel = g * np.where(o_bn >= 0, 1.0, 0.01)
        s1 = dsel.sum(axis=(0, 1, 2, 3))
        s2 = (dsel * xhat_sel).sum(axis=(0, 1, 2, 3))
        g_mu, g_var = 1.0, 0.5  # the loss's mu/var cotangents
        xhat = (ph - mu) * rstd
        dxhat = np.where(first, (dsel * gam)[:, :, :, :, None, :], 0.0)
        dy = (rstd * (dxhat - gam * s1 / n - xhat * gam * s2 / n)
              + g_mu / n - 2.0 * g_var * mu / n + ph * (2.0 * g_var / n))
        return dy.reshape(b, t, h, w, c4), s2, s1

    ok_all = True
    # (B, T, H', W', C): s2d stage-1/2/3 shapes at batch 8 (same lane/block
    # geometry class as b128/b256 — row counts are pow2 multiples)
    geoms = [(8, 8, 128, 128, 16, jnp.bfloat16),
             (8, 8, 64, 64, 32, jnp.bfloat16),
             (8, 8, 32, 32, 64, jnp.bfloat16),
             (2, 4, 16, 16, 16, jnp.float32)]
    for b, t, h, w, c, dtype in geoms:
        rng = np.random.default_rng(c)
        y = jnp.asarray(rng.standard_normal((b, t, h, w, 4 * c)) * 0.7, dtype)
        g = rng.standard_normal(c) * 0.8
        g[: c // 3] = -np.abs(g[: c // 3]) - 0.1
        gamma = jnp.asarray(g, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((b, t, h, w, c)), jnp.float32)

        out_f, mu_f, var_f = jax.jit(fused_bn_phasemax_leaky)(y, gamma, beta)
        out_x, mu_x, var_x = jax.jit(xla_tail)(y, gamma, beta)
        gf = jax.jit(jax.grad(loss(fused_bn_phasemax_leaky, w1),
                              argnums=(0, 1, 2)))(y, gamma, beta)
        gx = jax.jit(jax.grad(loss(xla_tail, w1),
                              argnums=(0, 1, 2)))(y, gamma, beta)

        def rel(a, b):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            d = float(np.linalg.norm(a - b))
            n = float(np.linalg.norm(b)) or 1.0
            return d / n

        dy_gold, _, _ = golden_dy(y, gamma, beta, w1)
        errs = {
            "out": rel(out_f, out_x), "mu": rel(mu_f, mu_x),
            "var": rel(var_f, var_x),
            "dy": rel(gf[0], dy_gold), "dgamma": rel(gf[1], gx[1]),
            "dbeta": rel(gf[2], gx[2]),
        }
        # dy is held to the fp64 golden implementing the kernel's documented
        # first-match tie rule (bf16 tolerance = output-cast rounding noise);
        # dy_xla_vs_golden documents how far the XLA even-split tie rule
        # sits from the same golden — the source of the old ~3e-2 fused-vs-
        # XLA bf16 dy gap (both rules are valid subgradients; ties are
        # measure-zero in fp32 but common in bf16's 8-bit mantissa).
        tol = 1e-5 if dtype == jnp.float32 else 5e-3
        ok = all(v < tol for v in errs.values())
        ok_all = ok_all and ok
        print(json.dumps({"geom": [b, t, h, w, c], "dtype": str(np.dtype(
            dtype)), "ok": bool(ok), "rel_errs": {k: round(v, 8)
                                                  for k, v in errs.items()},
            "dy_xla_vs_golden": round(rel(gx[0], dy_gold), 8)}),
              flush=True)
    print(json.dumps({"metric": "pallas_epilogue_onchip_validation",
                      "ok": bool(ok_all)}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
