"""Pallas TPU kernels for the aggregation hot path."""
