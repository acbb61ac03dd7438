"""Pallas (Mosaic) TPU kernels for the hot oracle paths."""
