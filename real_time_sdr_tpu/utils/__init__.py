"""Host-side utilities: I/O, PCM formatting, synthesis, state checkpointing."""
