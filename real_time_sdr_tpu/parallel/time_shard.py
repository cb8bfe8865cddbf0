"""Time-axis sequence parallelism with halo re-acquisition.

The reference scales an infinite sample stream by strictly sequential block
processing with carried state (SURVEY.md section 5 'long-context'). To shard
*time* across devices we exploit the structure of that carried state:

- FIR tails and the discriminator's previous sample are pure input history:
  a shard that also sees the last ``overlap`` blocks of its left neighbour
  (exchanged via ``lax.ppermute`` over the ICI ring) reproduces them exactly.
- The PLL carry is a nonlinear recurrence, but the loop *re-acquires* from
  arbitrary state within ~1/(norm_bw) samples; the same overlap region lets
  each shard warm its PLL before its real segment (bounded divergence,
  validated against the sequential chain in tests).
- Decoder bit state is protocol-level; the host frame sync hunts for block
  boundaries anyway, so per-shard bit streams concatenate safely.

Semantics: steady-state output matches the sequential receiver; the first
``overlap`` blocks of each shard (and nothing of shard 0) are warm-up and
are discarded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from real_time_sdr_tpu.models.receiver import Receiver


def time_sharded_run(rx: Receiver, mesh: Mesh, blocks: jax.Array,
                     axis: str = "time", overlap: int = 1):
    """Run ``blocks`` (B, 2*block_size_iq) uint8 sharded in time.

    B must be divisible by the mesh axis size. Returns the stacked
    ReceiverOutput for all B blocks (leading axis B, time-ordered).
    """
    t = mesh.shape[axis]
    b = blocks.shape[0]
    assert b % t == 0, f"blocks {b} not divisible by time shards {t}"
    nb_local = b // t

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis),
        out_specs=P(axis), check_vma=False)
    def run(local_blocks):
        # halo: my last `overlap` blocks -> right neighbour
        tail = local_blocks[-overlap:]
        halo = jax.lax.ppermute(
            tail, axis, perm=[(i, (i + 1) % t) for i in range(t)])
        my_id = jax.lax.axis_index(axis)
        # Shard 0 has no left context: warm up on its own leading blocks.
        # (Silence is NOT a neutral warm-up: atan2(+-0, negative feedback)
        # is +-pi, so the PLL random-walks on zero input — exactly as the
        # reference's atan2 detector would — and can settle in quadrature,
        # flipping the stereo difference sign.)
        halo = jnp.where(my_id == 0, local_blocks[:overlap], halo)
        seq = jnp.concatenate([halo, local_blocks], axis=0)
        state = rx.init_state()
        final, outs = rx.run_blocks(state, seq)
        # drop warm-up outputs
        return jax.tree_util.tree_map(
            lambda o: o[overlap:] if o is not None else None, outs)

    return run(blocks)
