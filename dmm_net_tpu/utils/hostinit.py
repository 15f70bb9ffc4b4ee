"""Host-side eager flax init.

``flax.linen.Module.init`` executes the full un-jitted forward op by op.
On a directly-attached TPU that is merely wasteful; through the axon
relay it is pathological — thousands of per-op RPC round trips (measured
this session: a 25-minute stall before the first train step, the client
futex-parked at single-digit CPU%). The init forward's VALUES are
discarded anyway (only the param tree matters), so there is no reason to
run it on the accelerator at all.

``host_init`` runs the init thunk on the always-present CPU backend and
ships the resulting variables to the default device in ONE transfer.

Caveat discovered while building this (and pinned by
tests/test_hostinit.py): ``jax.device_put`` of a CPU-*backend*
``jax.Array`` onto the axon TPU hangs indefinitely (cross-backend
transfer path; a 4x4 array never arrived in >150 s), while numpy ->
axon is fast (~84 MB/s measured). So the tree is materialized through
numpy before the device_put.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def host_init(init_thunk: Callable[[], object], device=None):
    """Run ``init_thunk`` (a zero-arg closure over ``model.init(...)``)
    eagerly on the host CPU backend, then place the resulting pytree on
    ``device`` via numpy.

    ``device`` may be a ``jax.Device``, a ``jax.sharding.Sharding`` (e.g.
    a replicated ``NamedSharding`` over a mesh — preferred for multi-chip,
    so the jitted step's in_shardings match with no resharding), or None
    (default: the process's default device).

    Returns the variables tree, leaves on the target device/sharding. When
    the target platform already is CPU (tests), the tree is returned as
    produced — no copy. Pallas kernels inside the init forward must pick
    interpret mode from ``kernels.auto_interpret()`` (which respects the
    ``jax.default_device`` context), not ``jax.default_backend()`` — the
    latter still reports "tpu" in here, which crashed every use_pallas TPU
    entry point in round 4 (pinned by tests/test_hostinit.py)."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = init_thunk()
    target = device if device is not None else jax.devices()[0]
    platforms = (
        {d.platform for d in target.device_set}
        if isinstance(target, jax.sharding.Sharding)
        else {target.platform}
    )
    if platforms == {"cpu"}:
        if isinstance(target, jax.sharding.Sharding):
            return jax.device_put(variables, target)
        return variables
    host_tree = jax.tree.map(np.asarray, variables)
    return jax.device_put(host_tree, target)
