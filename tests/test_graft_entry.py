"""Driver-style invocation of `__graft_entry__.dryrun_multichip`.

Round-1 regression: the driver invokes `dryrun_multichip(8)` in a bare
process where the axon site hook forces `JAX_PLATFORMS=axon`; initializing
that backend fails (libtpu skew) and must never happen — the function has to
force its own 8-device virtual-CPU mesh (MULTICHIP_r01 was rc=1 for this).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bare_subprocess():
    env = dict(os.environ)
    # simulate the driver: no CPU forcing, axon platform preset by site hook
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    # one line per flag-matrix block (round-4 widening): the core dp x tp
    # check plus the K-step / microbatch / frames compositions
    assert "dryrun_multichip fusion dpxtp ok" in out.stdout
    assert "K=2 (--steps_per_dispatch) ok" in out.stdout
    assert "fusion dp microbatch=2 ok" in out.stdout
    assert "frames(full) ok" in out.stdout
    assert "frames(full) dpxtp ok" in out.stdout
    assert "separator(fusion_encode=full) ok" in out.stdout
    assert "'data': 4, 'model': 2" in out.stdout


def test_dryrun_multichip_errors_on_foreign_backend():
    import jax

    jax.devices()  # ensure the (cpu) backend is initialized
    from __graft_entry__ import _force_virtual_cpu_mesh

    # already-initialized CPU backend is fine — should not raise
    _jax, devs = _force_virtual_cpu_mesh(8)
    assert len(devs) == 8
