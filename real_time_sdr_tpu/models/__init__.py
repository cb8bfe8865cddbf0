"""Receiver chains: pure (state, block) -> (state, outputs) functions."""
