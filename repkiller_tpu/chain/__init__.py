"""Seed chaining + fragment merge (SURVEY.md §1 L3)."""

from .diagonal import extend_gated  # noqa: F401
from .merge import merge_accept  # noqa: F401
