"""Pallas TPU kernels: fused cost+matcher, ROI-Align."""

import jax


def auto_interpret() -> bool:
    """Whether a Pallas call issued *right now* must use interpret mode.

    Pallas compiles only for TPU; every other platform needs
    ``interpret=True``. The platform that matters is the one the call will
    actually be dispatched to — which is ``jax.config.jax_default_device``
    when a ``jax.default_device(...)`` context is active (e.g.
    ``utils.hostinit.host_init`` running the eager init forward on the host
    CPU while the process default backend is still "tpu"), and the process
    default backend otherwise. Reading only ``jax.default_backend()`` here
    crashed every use_pallas TPU entry point in round 4
    ("Only interpret mode is supported on CPU backend", BENCH_r04 rc=1):
    inside ``jax.default_device(cpu)`` the backend still reports "tpu" but
    the op lowers for CPU. Pinned by tests/test_hostinit.py."""
    dev = jax.config.jax_default_device
    if dev is None:
        platform = jax.default_backend()
    elif isinstance(dev, str):  # settable as a platform name via env/config
        platform = dev
    else:
        platform = dev.platform
    return platform != "tpu"


from dmm_net_tpu.kernels.matcher import fused_cost_match  # noqa: E402,F401
