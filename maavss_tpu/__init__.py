"""maavss_tpu — a TPU-native (JAX / XLA / Pallas / pjit) audio-visual source
separation framework with the capability surface of carlmoore256/MAAVSS.

The reference (/root/reference) is a single-GPU PyTorch research codebase; this
framework is a ground-up redesign for TPU:

- compute path: jnp/XLA (convs + matmuls on the MXU, bf16-friendly), Pallas
  kernels for fused hot ops, `lax.scan` recurrences,
- parallelism: `jax.sharding.Mesh` + jit-with-shardings (data + model axes),
- data plane: ahead-of-time ingest to fixed-shape array shards + memmaps,
  host prefetch pipeline, jit-compiled batched preprocessing on device,
- experiment plane: jsonl/wandb-optional metrics, orbax checkpoints with
  auto-resume-latest semantics (reference: utilities.py:165-204).
"""

__version__ = "0.1.0"

from maavss_tpu.config import RunConfig, model_args  # noqa: F401
from maavss_tpu.utils.hop import calc_hop_size  # noqa: F401
