"""Utilities: config, PLY IO, checkpoint conversion, native bindings,
profiling, seeding (SURVEY.md §2.2 L8/L9)."""

from .config import ConfigDict, build_model, load_config
from .seeding import seed_everything

__all__ = [
    "ConfigDict",
    "build_model",
    "load_config",
    "seed_everything",
]
