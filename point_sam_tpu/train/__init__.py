"""Training harness (SURVEY.md §2.2 L3/L4)."""

from .schedule import warmup_multistep

__all__ = ["warmup_multistep"]
