"""Worker process for the 2-process multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device runtime (the DCN-shaped path of
maavss_tpu/parallel/distributed.py — SURVEY.md §5.8). The worker builds the
tiny fusion model deterministically, feeds ONLY its host-local slice of the
global batch through `host_local_to_global`, runs one sharded train step, and
prints the (globally identical) loss for the parent to compare.

Env: MH_COORD (host:port), MH_NPROC, MH_PID.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

GLOBAL_BATCH = 8


def tiny_cfg():
    from maavss_tpu.config import RunConfig

    return RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                     p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                     batch_size=GLOBAL_BATCH, noise_scalar=0.0)


def build(cfg):
    import jax.numpy as jnp

    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.train.state import create_train_state, make_optimizer

    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(GLOBAL_BATCH, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(GLOBAL_BATCH, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    state = create_train_state(vs, make_optimizer(cfg.learning_rate, "adam"))
    return model, state


def main() -> None:
    # distributed init MUST precede anything that could initialize the XLA
    # backend — including importing framework modules that probe devices
    from maavss_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=os.environ["MH_COORD"],
        num_processes=int(os.environ["MH_NPROC"]),
        process_id=int(os.environ["MH_PID"]),
    )
    import jax.numpy as jnp  # noqa: F401

    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.steps import make_fusion_step

    assert jax.process_count() == int(os.environ["MH_NPROC"])
    assert len(jax.devices()) == 8, jax.devices()

    cfg = tiny_cfg()
    mesh = distributed.global_mesh(data=8)
    model, state = build(cfg)
    step = make_fusion_step(model, cfg, mesh=mesh)

    # every process generates the SAME global batch (seeded), then keeps only
    # its own rows — the host-local input-pipeline contract
    full = synthetic_av_batch(cfg, GLOBAL_BATCH, seed=11)
    sl = distributed.process_batch_slice(GLOBAL_BATCH)
    local = {k: v[sl] for k, v in full.items()}
    batch = distributed.host_local_to_global(mesh, local)

    state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
    loss = float(metrics["loss"])
    print(f"MHLOSS {loss:.8f}", flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
