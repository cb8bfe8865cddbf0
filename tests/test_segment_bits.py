"""decode_segment_bits (batched, scan-free) must be BIT-IDENTICAL to
scanning decode_block_bits with the reference's 5-block warm-up gate
(src/rds.cpp:135) — across warm-boundary positions, first-block alignment
scoring, odd/even symbol-count parities, and carried half-symbol cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real_time_sdr_tpu.ops.rds_bits import (BitSyncState, bit_sync_init,
                                            decode_block_bits,
                                            decode_segment_bits)

SPS = 39
L = 2836                      # mode-0 rds_block
MAX_SYM = -(-L // SPS)
MAX_BITS = MAX_SYM // 2 + 2


def _scan_oracle(clean, state, block_count, warm_after=5):
    """Per-block loop twin of models/rds.RdsPath._decode_one."""
    bits_all, n_all = [], []
    count = int(block_count)
    for b in range(clean.shape[0]):
        bits, n_bits, new_state = decode_block_bits(
            jnp.asarray(clean[b]), state, SPS, MAX_SYM, MAX_BITS)
        warm = count > warm_after
        n_bits = jnp.where(warm, n_bits, 0)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(warm, new, old), new_state, state)
        bits_all.append(np.asarray(bits))
        n_all.append(int(n_bits))
        count += 1
    return np.stack(bits_all), np.asarray(n_all), state


@pytest.mark.parametrize("nb", [1, 3, 12])
@pytest.mark.parametrize("block_count", [0, 3, 6, 100])
def test_segment_bits_bit_identical(nb, block_count):
    rng = np.random.default_rng(nb * 1000 + block_count)
    clean = rng.standard_normal((nb, L)).astype(np.float32)
    state = bit_sync_init()

    ref_bits, ref_n, ref_state = _scan_oracle(clean, state, block_count)
    got_bits, got_n, got_state = jax.jit(
        lambda c, s, bc: decode_segment_bits(c, s, bc, SPS, MAX_SYM,
                                             MAX_BITS))(
        jnp.asarray(clean), state, jnp.int32(block_count))

    np.testing.assert_array_equal(np.asarray(got_n), ref_n)
    np.testing.assert_array_equal(np.asarray(got_bits), ref_bits)
    for a, b in zip(jax.tree_util.tree_leaves(got_state),
                    jax.tree_util.tree_leaves(ref_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segment_bits_mid_stream_state():
    """Resume from a non-initial carried state (first=False, carried
    half-symbol/last-bit), warm boundary inside the segment."""
    rng = np.random.default_rng(7)
    state = BitSyncState(first=jnp.asarray(False), start=jnp.int32(1),
                         half_symbol=jnp.int32(1), last_bit=jnp.int32(1))
    for block_count in (2, 4, 6):
        clean = rng.standard_normal((8, L)).astype(np.float32)
        ref_bits, ref_n, ref_state = _scan_oracle(clean, state, block_count)
        got_bits, got_n, got_state = decode_segment_bits(
            jnp.asarray(clean), state, jnp.int32(block_count), SPS,
            MAX_SYM, MAX_BITS)
        np.testing.assert_array_equal(np.asarray(got_n), ref_n)
        np.testing.assert_array_equal(np.asarray(got_bits), ref_bits)
        for a, b in zip(jax.tree_util.tree_leaves(got_state),
                        jax.tree_util.tree_leaves(ref_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segment_bits_chains_across_calls():
    """Two 6-block segment calls == one 12-block segment call."""
    rng = np.random.default_rng(13)
    clean = rng.standard_normal((12, L)).astype(np.float32)
    s0 = bit_sync_init()
    b1, n1, s1 = decode_segment_bits(jnp.asarray(clean[:6]), s0,
                                     jnp.int32(0), SPS, MAX_SYM, MAX_BITS)
    b2, n2, s2 = decode_segment_bits(jnp.asarray(clean[6:]), s1,
                                     jnp.int32(6), SPS, MAX_SYM, MAX_BITS)
    bf, nf, sf = decode_segment_bits(jnp.asarray(clean), s0, jnp.int32(0),
                                     SPS, MAX_SYM, MAX_BITS)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(n1), np.asarray(n2)]), np.asarray(nf))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b1), np.asarray(b2)]), np.asarray(bf))
    for a, b in zip(jax.tree_util.tree_leaves(s2),
                    jax.tree_util.tree_leaves(sf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
