"""Repeat-family clustering (repkiller proper, SURVEY.md §2.1)."""

from .cluster import cluster_families  # noqa: F401
