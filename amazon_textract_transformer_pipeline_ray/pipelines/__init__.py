"""Composed Ray Data pipelines (plan builders — lazy until consumed)."""
