"""Multi-chip scaling: channel-bank data parallelism and time-axis
sequence parallelism over a jax Mesh (SURVEY.md section 2.3)."""
