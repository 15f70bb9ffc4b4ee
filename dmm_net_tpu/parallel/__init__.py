"""Device-mesh / sharding helpers (XLA SPMD; no hand-written collectives)."""

from dmm_net_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
