"""Utility layer: units, config, helpers, scale functions, linalg."""
from . import units  # noqa: F401
from .config import config, change_memory_fraction  # noqa: F401
