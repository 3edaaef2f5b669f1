"""Ray Data stages: batch UDFs and actor classes."""
