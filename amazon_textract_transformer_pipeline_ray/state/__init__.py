"""Checkpoint manifests, lineage ids, idempotent resume."""
