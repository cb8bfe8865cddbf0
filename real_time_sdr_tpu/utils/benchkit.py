"""Shared measurement scaffolding for bench.py and experiments/.

Two pieces every whole-receiver measurement needs, kept in one place so the
benchmark and the A/B experiments cannot drift apart:

- a vmapped, jitted "digest step": runs the receiver over a segment batch
  and reduces every output leaf to ONE scalar. Fetching that scalar is the
  only reliable device sync on the axon platform (`block_until_ready` does
  not synchronize there — CLAUDE.md), and it keeps the host<->device
  traffic to 4 bytes per measured run.
- decorrelated per-channel inputs built ON DEVICE: one host->device
  transfer of the base segment, then per-channel time shifts via
  dynamic_slice of a doubled copy (a wide bank would otherwise push n_ch
  copies through the ~40-60 ms tunnel).
"""

from __future__ import annotations


def digest_step(rx):
    """jit(vmap((state, seg) -> (state, scalar))) over ``rx.run_segment``.

    The scalar sums every output leaf (int32 leaves cast to f32), so any
    numerical change anywhere in the chain moves the digest — A/B configs
    compare it to prove equivalence.
    """
    import jax
    import jax.numpy as jnp

    def digest_fn(state, seg):
        s2, out = rx.run_segment(state, seg)
        sums = [jnp.sum(o if o.dtype != jnp.int32 else o.astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(out)]
        return s2, sum(sums)

    return jax.jit(jax.vmap(digest_fn))


def shifted_channel_segments(iq, n_ch: int, n_len: int):
    """(n_ch, n_len) uint8: per-channel cyclic time shifts of ``iq[:n_len]``,
    built on device from one transferred base segment."""
    import jax
    import jax.numpy as jnp

    base2 = jnp.concatenate([jnp.asarray(iq[:n_len])] * 2)
    shifts = jnp.asarray([(2 * 997 * c) % n_len for c in range(n_ch)],
                         jnp.int32)
    return jax.jit(jax.vmap(
        lambda s: jax.lax.dynamic_slice(base2, (s,), (n_len,))))(shifts)


def tunnel_rt_floor(reps: int = 5) -> float:
    """Measured host<->device round-trip floor in seconds (min of reps).

    The axon tunnel adds ~40-60 ms per sync (CLAUDE.md); experiments
    subtract this from timed spans so absolute per-block numbers are not
    biased by the fetch. One jitted bump reused across probes — a fresh
    jit per call would time re-tracing, not the RPC."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    bump = jax.jit(lambda x: x + 1)
    tiny = bump(jnp.zeros((8,), jnp.float32))
    float(np.asarray(tiny)[0])  # compile + first fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(bump(tiny))[0])
        best = min(best, time.perf_counter() - t0)
    return best


def shifted_channel_segments_host(iq, n_ch: int, n_len: int):
    """Host (numpy) twin of shifted_channel_segments, for the STAGED
    serving path: staging happens on the host anyway, so building the
    shifted bank on device and fetching it back would round-trip the whole
    capture through the ~40-60 ms tunnel twice for nothing."""
    import numpy as np

    base = np.asarray(iq[:n_len])
    return np.stack([np.roll(base, -((2 * 997 * c) % n_len))
                     for c in range(n_ch)])


def digest_step_staged(rx, n2: int):
    """Staged twin of digest_step: segments arrive as HOST-staged padded
    operands (rx.frontend.stage_segment), so the device graph runs zero
    staging copies. Bit-identical digests to digest_step on the same data
    (tests/test_pallas_frontend.py::test_staged_segment_bit_exact)."""
    import jax
    import jax.numpy as jnp

    def digest_fn(state, xp):
        s2, out = rx.run_segment_staged(state, xp, n2)
        sums = [jnp.sum(o if o.dtype != jnp.int32 else o.astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(out)]
        return s2, sum(sums)

    return jax.jit(jax.vmap(digest_fn))


def stage_cells(rx, per_ch_host, n_g: int, g: int, n_chunks: int,
                chunk_len: int):
    """Host-stage the bench serving cells: cells[gi][k] is the padded
    operand for sub-bank gi, chunk k, with the embedded tail taken from
    chunk k-1 (cyclically — the bench replays the chunk ring, so the
    steady-state tail of chunk 0 is chunk n_chunks-1's end)."""
    import jax

    tl = rx.frontend.rf_fir.tail_len
    cells = []
    for gi in range(n_g):
        rows = per_ch_host[gi * g:(gi + 1) * g]
        col = []
        for k in range(n_chunks):
            seg = rows[:, k * chunk_len:(k + 1) * chunk_len]
            kp = (k - 1) % n_chunks  # steady-state cyclic replay tail
            tail = rows[:, (kp + 1) * chunk_len - tl:(kp + 1) * chunk_len]
            col.append(jax.device_put(
                rx.frontend.stage_segment_full(tail, seg)))
        cells.append(col)
    return cells
