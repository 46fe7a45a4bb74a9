"""Distributed runtime: mesh, sharded pipeline, windowed streaming,
multi-host output assembly (SURVEY.md §2.3, §3.4)."""
