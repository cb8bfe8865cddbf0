"""Golden NumPy/float64 oracle models for the TPU receiver (see dsp.py)."""
