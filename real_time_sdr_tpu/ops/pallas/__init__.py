"""Pallas TPU kernels for the hot DSP ops."""
