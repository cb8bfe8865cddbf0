"""Replay of 56 off-air RDS group registers captured by the reference
(test/parser_test.cpp:79-136) through both framers.

This breaks the self-synthesized-fixture circularity: the data words come
from a real broadcast (PI 0xC27A, PTY Rock, dynamic PS cycling
'  Love  '/'  Dies  ', RadioText 'Foo Fighters - Love Dies Young'), not
from this repo's own encoder. The register values are captured DATA
constants, reproduced verbatim; expected outputs below were derived from
the RBDS bit layout and frozen.
"""

import numpy as np

from real_time_sdr_tpu.models.rds_framing import RdsFramer, SyncByOffsetDecoder
from real_time_sdr_tpu.utils import synth

CAPTURED_REGS = [
    14013513924445631589, 14013549063265283872, 14013513945920467571,
    14013654642130354176, 14013513915855685225, 14013549067559855976,
    14013531469908082688, 14013654642130354176, 14013513920150660968,
    14013549072626315891, 14013566722989542726, 14013654642130354176,
    14013513915855675424, 14013549075508305996, 14013513920150654063,
    14013654663698388830, 14013513924445632101, 14013549081133475104,
    14013513945920446496, 14013654663698388830, 14013513915855675424,
    14013549084706170227, 14013513920150654063, 14013654663698388830,
    14013513924445632101, 14013549088396111733, 14013513945920446496,
    14013654663698386240, 14013513915855675424, 14013549094000594208,
    14013513920150654063, 14013654663698386240, 14013513915855675424,
    14013549063265283872, 14013531469908082688, 14013654663698386240,
    14013513920150652009, 14013549067559855976, 14013566724093037894,
    14013654658329710035, 14013513924445627763, 14013549072626315891,
    14013513945920446496, 14013654658329710035, 14013513915855675424,
    14013549075508305996, 14013513920150652009, 14013654658329710035,
    14013513924445627763, 14013549081133475104, 14013513945920446496,
    14013654663700715284, 14013513915855675424, 14013549084706170227,
    14013513920150652009, 14013654663700715284,
]

EXPECT_PI = 0xC27A
EXPECT_PTY = "Rock"
EXPECT_RT = "Foo Fighters - Love Dies Young"
EXPECT_PS_TAIL = ["  Love  ", "  Love  ", "  Dies  ", "  Dies  "]


def _reg_words(g: int) -> list[int]:
    return [(g >> 48) & 0xFFFF, (g >> 32) & 0xFFFF,
            (g >> 16) & 0xFFFF, g & 0xFFFF]


def test_captured_registers_direct_parse():
    """Group-register layer: the 56 real groups through RdsFramer's parser."""
    events = []
    fr = RdsFramer(on_event=lambda k, v: events.append((k, v)))
    for g in CAPTURED_REGS:
        fr._group(g)
    assert fr.events.pi == EXPECT_PI
    assert fr.events.pty == EXPECT_PTY
    assert fr.events.radiotext.strip() == EXPECT_RT
    ps = [v for k, v in events if k == "ps"]
    assert ps[-4:] == EXPECT_PS_TAIL
    assert fr.events.groups_decoded == len(CAPTURED_REGS)


def test_captured_registers_bitstream_both_framers():
    """Bit layer: re-emit each captured group's 104 transmitted bits
    (CRC + offset words via the transmit-side encoder) and run the full
    sync walk of BOTH framers over the resulting real-content stream."""
    bits = []
    for g in CAPTURED_REGS:
        bits.extend(synth.group_to_bits(_reg_words(g)))
    stream = np.array(bits, dtype=np.int8)

    fr = RdsFramer()
    fr.feed(stream)
    assert fr.events.pi == EXPECT_PI
    assert fr.events.pty == EXPECT_PTY
    assert fr.events.radiotext.strip() == EXPECT_RT
    assert fr.events.ps_name == EXPECT_PS_TAIL[-1]
    assert fr.events.groups_decoded == len(CAPTURED_REGS)

    alt = SyncByOffsetDecoder()
    alt.feed(stream)
    assert alt.events.pi == EXPECT_PI
    assert alt.events.pty == EXPECT_PTY
    assert alt.events.radiotext.strip() == EXPECT_RT
    assert alt.events.ps_name == EXPECT_PS_TAIL[-1]


def test_captured_registers_survive_bit_errors():
    """A corrupted block is rejected by CRC, the rest still decodes."""
    bits = []
    for g in CAPTURED_REGS:
        bits.extend(synth.group_to_bits(_reg_words(g)))
    stream = np.array(bits, dtype=np.int8)
    rng = np.random.default_rng(3)
    bad = rng.choice(len(stream), size=6, replace=False)
    stream[bad] ^= 1

    fr = RdsFramer()
    fr.feed(stream)
    assert fr.events.pi == EXPECT_PI
    # the RBDS checkword detects (not corrects): segments in corrupted
    # blocks stay blank, everything else decodes — same behaviour as the
    # reference's check_block gate (src/rds_utilities.cpp:352-381)
    assert "Foo Fighters" in fr.events.radiotext
    assert "Dies Young" in fr.events.radiotext
