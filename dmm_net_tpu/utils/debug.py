"""Numerical-safety tooling (SURVEY.md §6 "Race detection / sanitizers" row).

The reference has no sanitizers; its CUDA kernels are unchecked. The JAX
equivalents used here:

  * `enable_nan_debugging()` — global debug_nans/debug_infs: any NaN/Inf
    produced under jit raises at the producing op (CI numerics jobs);
  * `checked(fn)` — wraps a function with `checkify` so out-of-bounds
    indexing and NaNs become checked errors with payloads instead of
    silent garbage;
  * Pallas interpret mode (kernels run under the interpreter on CPU in
    tests) serves as the "sanitizer" for kernel logic — see
    tests/test_pallas_matcher.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked(fn: Callable, *, checks=None) -> Callable:
    """Return a wrapped fn that raises collected checkify errors eagerly."""
    checks = checks or (checkify.index_checks | checkify.nan_checks)
    cfn = checkify.checkify(fn, errors=checks)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
