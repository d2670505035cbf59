"""Pallas/Mosaic TPU kernels (see docs/PERFORMANCE.md for measurements)."""
