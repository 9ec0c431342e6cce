"""Numeric-sanity guards (the framework's sanitizer layer, SURVEY.md §5).

The reference silently swallows numeric trouble (bare try/except around the
warp, motion.py:311-318; singular normal-equation systems raise deep inside
np.linalg.inv).  Here the numeric core carries `checkify` checks that are
compiled in only when explicitly enabled — zero overhead on the production
path, a clear Python exception under `run_checked` / `debug_checks()`.

Usage:
    from gme_tpu.utils.guards import run_checked
    out = run_checked(gme_pipeline_step, prev, curr, cfg)   # raises on NaN /
                                                            # degenerate fit

Checks are read at TRACE time: enabling the context and calling an
already-compiled function does nothing — `run_checked` always retraces.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

from jax.experimental import checkify

_ENABLED = False


def checks_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def debug_checks():
    """Enable guard checks for functions TRACED inside this context."""
    global _ENABLED
    old = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = old


def check(pred, msg: str, **fmt_kwargs) -> None:
    """`checkify.check` that compiles to nothing unless guards are enabled
    at trace time.  Call sites live in the numeric core (affine fit etc.)."""
    if _ENABLED:
        checkify.check(pred, msg, **fmt_kwargs)


def run_checked(fn: Callable, *args: Any, **kwargs: Any):
    """Trace `fn` with guards + automatic float checks enabled, run it, and
    raise `checkify.JaxRuntimeError` on the first failed check (NaN/inf
    anywhere, or an explicit guard like a degenerate fit)."""
    with debug_checks():
        checked = checkify.checkify(
            lambda *a, **k: fn(*a, **k),
            errors=checkify.user_checks | checkify.float_checks,
        )
        err, out = checked(*args, **kwargs)
    err.throw()
    return out
