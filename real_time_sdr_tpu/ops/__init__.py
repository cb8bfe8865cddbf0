"""DSP kernel library: filter design (host) + on-device ops."""
