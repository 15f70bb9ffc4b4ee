"""Mesh + sharding helpers.

The reference's only parallelism is data parallelism via
torch.nn.DataParallel / NCCL DDP (SURVEY.md §3.3). The TPU-native
equivalent is declarative: build a `jax.sharding.Mesh` with a "data" axis
(and a declared-but-unit "model" axis for future TP), annotate the batch
dimension of inputs with `NamedSharding(P("data"))`, keep params
replicated, and let XLA SPMD insert the gradient all-reduces over ICI.
No hand-written collectives anywhere.

CI runs these paths on a fake 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`, SURVEY.md §5.2(6)); the
driver's `dryrun_multichip` uses the same entry points.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh. Defaults: all devices on "data"."""
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over "data"; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with axis 0 sharded on "data"."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
