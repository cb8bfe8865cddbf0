"""Golden RDS bit-level codec round trip: encode groups -> differential ->
Manchester -> symbols -> decode chain -> frame sync -> parsed PS name.

Establishes the oracle itself is self-consistent before any DSP is involved
(mirrors the reference's standalone parser test, test/parser_test.cpp)."""

import numpy as np

from golden import dsp


def test_crc_syndromes_match_reference_constants():
    syn = dsp.offset_syndromes()
    # constants from the reference's dormant decoder table
    # (src/rds_utilities.cpp:205) in its order A,B,C,D,C'
    assert syn["A"] == 383
    assert syn["B"] == 14
    assert syn["C"] == 303
    assert syn["D"] == 663
    assert syn["Cp"] == 748


def test_group_roundtrip_through_bit_decoders():
    pi, pty, name = 0x54A8, 5, "CBCRADIO"
    groups = dsp.ps_groups(pi, pty, name)
    bits = []
    for g in groups:
        bits.extend(dsp.group_to_bits(g))
    # pad with garbage on both sides to force the sliding sync to hunt
    rng = np.random.default_rng(0)
    stream = list(rng.integers(0, 2, 37)) + bits + list(rng.integers(0, 2, 20))

    # transmit-side: differential then Manchester encode
    diff = dsp.differential_encode(stream)
    syms = dsp.manchester_encode(diff)

    # receive-side: run blocks through manchester + differential decoders
    mstate = dsp.ManchesterState()
    last_bit = 0
    decoded = []
    block_sizes = [71, 73, 72, 73] * 40  # odd/even mix exercises carry state
    pos = 0
    bi = 0
    while pos < len(syms):
        blk = syms[pos:pos + block_sizes[bi % len(block_sizes)]]
        pos += len(blk)
        if not blk:
            break
        got = dsp.manchester_block(blk, bi, mstate)
        if got:
            d, last_bit = dsp.differential_block(got, bi, last_bit)
            decoded.extend(d)
        bi += 1

    # manchester alignment on "block 0" chose via scoring; recovered bits must
    # contain the original stream as a contiguous run
    s = "".join(map(str, stream))
    got = "".join(map(str, decoded))
    assert s in got

    fs = dsp.FrameSyncState()
    dsp.frame_sync(decoded, fs)
    assert fs.assembler.ps_name == name
    pis = {e[1] for e in fs.assembler.events if e[0] == "group"}
    assert pis == {pi}


def test_frame_sync_handles_split_streams():
    pi, pty, name = 0x1234, 2, "TESTFM  "
    bits = []
    for g in dsp.ps_groups(pi, pty, name):
        bits.extend(dsp.group_to_bits(g))
    fs = dsp.FrameSyncState()
    # feed in awkward chunk sizes; tail-bit carry must stitch windows
    for i in range(0, len(bits), 41):
        dsp.frame_sync(bits[i:i + 41], fs)
    assert fs.assembler.ps_name == name


def test_golden_assembler_decodes_version_b_groups():
    # 0B groups: version bit set, block 3 transmitted under the C' offset.
    # The oracle must map C' to the C block position like the production
    # RdsFramer does (models/rds_framing.py _block).
    pi, pty, name = 0x2AB0, 7, "BSIDEFM "
    bits = []
    for rep in range(2):          # repeat so sync hunts then locks
        for placement in range(4):
            word_b = (0 << 12) | (1 << 11) | (0 << 10) | (pty << 5) | placement
            chars = name[2 * placement:2 * placement + 2]
            word_d = (ord(chars[0]) << 8) | ord(chars[1])
            bits.extend(dsp.group_to_bits([pi, word_b, pi, word_d]))
    fs = dsp.FrameSyncState()
    dsp.frame_sync(bits, fs)
    assert fs.assembler.ps_name == name
    assert {e[1] for e in fs.assembler.events if e[0] == "group"} == {pi}


def test_golden_bit_decoders_tolerate_empty_blocks():
    st = dsp.ManchesterState(start=1, half_symbol=1)
    assert dsp.manchester_block([], 3, st) == []
    assert (st.start, st.half_symbol) == (1, 1)  # carry survives untouched
    out, last = dsp.differential_block([], 2, last_bit=1)
    assert out == [] and last == 1
