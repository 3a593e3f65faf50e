"""Multi-host (2-process) distributed path, exercised for real.

Round-1 left `parallel/distributed.py` single-process-tested; this spawns two
actual processes (4 virtual CPU devices each), joins them with
`jax.distributed.initialize` over a local coordinator, feeds host-local batch
slices through `host_local_to_global`, and runs one sharded fusion train step
— the DCN-shaped code path of SURVEY.md §5.8. The loss must (a) agree between
the two processes bit-for-bit (same global program) and (b) match a
single-process run of the identical step to fp tolerance (GSPMD inserts the
cross-process reductions; BatchNorm stays global-batch).

Slow-marked: two concurrent XLA compiles on a single-core host.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.update({"MH_COORD": f"127.0.0.1:{port}", "MH_NPROC": "2",
                    "MH_PID": str(pid)})
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    losses = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("MHLOSS")]
        assert line, f"no MHLOSS in worker output:\n{out}\n{err}"
        losses.append(float(line[-1].split()[1]))

    # (a) both processes computed the same global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-9)

    # (b) equals the single-process value of the identical step (this test
    # process already has 8 virtual devices via conftest)
    import jax
    import jax.numpy as jnp

    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.parallel.mesh import make_mesh, shard_batch
    from maavss_tpu.train.steps import make_fusion_step
    from tests._multihost_worker import GLOBAL_BATCH, build, tiny_cfg

    cfg = tiny_cfg()
    mesh = make_mesh(data=8)
    model, state = build(cfg)
    step = make_fusion_step(model, cfg, mesh=mesh)
    batch = shard_batch(mesh, synthetic_av_batch(cfg, GLOBAL_BATCH, seed=11))
    _, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
