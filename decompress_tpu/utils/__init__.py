"""Shared utilities: compile cache, config."""

from .cache import enable_compile_cache  # noqa: F401
