"""Checkpoint / resume for receiver state pytrees.

The reference's only cross-block persistence is its carried DSP state
(SURVEY.md section 5): FIR tails, discriminator samples, PLL loop state,
decoder bit state. Here that state is one explicit pytree, so
checkpoint/resume is just (de)serializing it — a capability the reference
lacks entirely.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp  # noqa: F401  (bf16 dtype check)


def _npz_path(path: str) -> str:
    # np.savez silently appends ".npz" to paths lacking the suffix; normalize
    # here so save_state and load_state always agree on the on-disk name.
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state) -> None:
    """Serialize a receiver state pytree to an .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        if a.dtype == jnp.bfloat16:  # npz has no bf16; f32 is lossless
            a = a.astype(np.float32)
        arrays[f"leaf_{i}"] = a
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(_npz_path(path), **arrays)


def load_state(path: str, like):
    """Restore a state pytree saved by save_state; ``like`` supplies the
    tree structure (e.g. ``rx.init_state()``)."""
    data = np.load(_npz_path(path))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        assert arr.shape == ref.shape, (
            f"state leaf {i}: checkpoint shape {arr.shape} != {ref.shape}")
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
