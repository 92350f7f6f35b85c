"""Once-per-process warnings for kernel dispatch fallbacks.

A Pallas/Mosaic regression must never *silently* eat the performance budget
(the fast kernels and their XLA fallbacks are numerically interchangeable,
so nothing downstream would notice). Every dispatch site that catches a
kernel failure routes through :func:`warn_fallback` so the regression is
visible exactly once in logs/bench output.
"""

from __future__ import annotations

import logging
import traceback

_logger = logging.getLogger("point_sam_tpu.ops")
_seen: set[str] = set()


def warn_fallback(site: str, exc: BaseException) -> None:
    """Log (once per process per site) that a fast kernel failed and the
    slow XLA path is being used instead."""
    if site in _seen:
        return
    _seen.add(site)
    tb = "".join(
        traceback.format_exception(type(exc), exc, exc.__traceback__, limit=5)
    )
    _logger.warning(
        "%s: Pallas kernel dispatch failed; falling back to the slow XLA "
        "path for the rest of this process. Benchmark numbers will be "
        "degraded. Cause:\n%s",
        site,
        tb,
    )
