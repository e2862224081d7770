"""Device mesh construction — the TPU-native replacement for the reference's
only distribution mechanism, HF Accelerate DDP over NCCL
(`train_addvisor.py:24,410-412`; SURVEY §2 parallelism statement).

Design: one ('data', 'model') mesh over all devices. The batch axis shards
over 'data' (the gradient allreduce the reference gets from DDP becomes an
XLA psum over ICI, inserted automatically by GSPMD from the shardings); the
2B-parameter embedder's attention/MLP optionally shard over 'model' (tensor
parallelism — the contingency for fp32 XLS-R-2B exceeding a single v5e core's
HBM, SURVEY §5). Multi-slice: 'data' maps onto DCN, 'model' stays intra-slice
on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xai_audio_deepfakes_tpu.config import MeshConfig


def initialize_distributed() -> None:
    """Multi-host bring-up: call once per process before device queries on
    multi-slice/multi-host TPU pods (reads the standard cluster env vars).
    Single-host (this environment) is a no-op. The reference's counterpart
    is `accelerate launch` process spawning (`train_addvisor.py:24`)."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: list | None = None
) -> Mesh:
    """Mesh of shape (n_devices // model_parallel, model_parallel)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = cfg.model_parallel
    assert n % mp == 0, f"{n} devices not divisible by model_parallel={mp}"
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
