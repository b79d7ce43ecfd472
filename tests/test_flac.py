"""ext/flac.py: RFC 9639 FLAC decode (+ the fixture encoder).

Golden strategy (the ext/vorbis.py / ext/mp3.py discipline): an
INDEPENDENT bit writer below hand-builds streams — constant/verbatim/
fixed/LPC subframes, all three stereo decorrelation modes, Rice
partitions with escapes, wasted bits — and the production decoder must
reconstruct the exact integers.  The production encoder is only trusted
after the decoder is pinned, then roundtrips are property-tested.
CRC-8/CRC-16 are pinned against the published check values first, so
using the production CRC helpers inside the hand-built streams does not
make the tests self-referential."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tulflow_spark.ext.flac import (
    FlacError,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    parse_flac_header,
)


# ---------------------------------------------------------------------------
# independent writer (deliberately different style from the production one)
# ---------------------------------------------------------------------------


class W:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> "W":
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def put_unary(self, q: int) -> "W":
        self.bits.extend([0] * q + [1])
        return self

    def out(self) -> bytes:
        assert len(self.bits) % 8 == 0
        by = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            by.append(v)
        return bytes(by)


def streaminfo(rate=8000, channels=1, bps=16, total=0, block=16):
    w = W()
    w.put(0x80, 8).put(34, 24)          # last block, STREAMINFO, 34 bytes
    w.put(block, 16).put(block, 16)
    w.put(0, 24).put(0, 24)
    w.put(rate, 20).put(channels - 1, 3).put(bps - 1, 5).put(total, 36)
    body = w.out() + b"\x00" * 16       # zero MD5: decoder skips the check
    return b"fLaC" + body


def frame_header(block_size, chan_code, frame_idx=0, ss_code=4):
    w = W()
    w.put(0x3FFE, 14).put(0, 1).put(0, 1)
    w.put(6, 4)          # 8-bit block size follows
    w.put(0, 4)          # rate from STREAMINFO
    w.put(chan_code, 4)
    w.put(ss_code, 3).put(0, 1)
    w.put(frame_idx, 8)  # coded number, 1-byte form
    w.put(block_size - 1, 8)
    hdr = w.out()
    return hdr + bytes([crc8(hdr)])


def finish_frame(header: bytes, body_w: W) -> bytes:
    while len(body_w.bits) % 8:
        body_w.put(0, 1)
    frame = header + body_w.out()
    return frame + struct.pack(">H", crc16(frame))


def verbatim(samples, bits) -> W:
    w = W()
    w.put(0, 1).put(1, 6).put(0, 1)
    for s in samples:
        w.put(s & ((1 << bits) - 1), bits)
    return w


def decode_ints(blob, bps=16, channels=1):
    mono, rate = decode_flac(blob)
    return np.rint(mono.astype(np.float64) * (1 << (bps - 1))
                   * 1.0).astype(np.int64), rate


# ---------------------------------------------------------------------------
# CRC pins (published check values for poly 0x07 / 0x8005, init 0)
# ---------------------------------------------------------------------------


def test_crc_check_values():
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (aka BUYPASS)
    assert crc8(b"") == 0 and crc16(b"") == 0


# ---------------------------------------------------------------------------
# hand-built streams
# ---------------------------------------------------------------------------


def test_constant_subframe():
    hdr = frame_header(4, chan_code=0)
    body = W().put(0, 1).put(0, 6).put(0, 1).put(-7 & 0xFFFF, 16)
    blob = streaminfo(total=4) + finish_frame(hdr, body)
    ints, rate = decode_ints(blob)
    assert rate == 8000
    assert ints.tolist() == [-7, -7, -7, -7]


def test_verbatim_subframe_exact():
    samples = [1, -1, 32767, -32768]
    hdr = frame_header(4, chan_code=0)
    blob = streaminfo(total=4) + finish_frame(hdr, verbatim(samples, 16))
    ints, _ = decode_ints(blob)
    assert ints.tolist() == samples


def test_fixed_order2_rice_hand_derived():
    # samples [3, 5, 8] with order-2 fixed predictor: residual
    # r = s[2] - 2 s[1] + s[0] = 1; zigzag(1) = 1... wait: zigzag maps
    # 1 -> 2 (v>=0 -> 2v).  Rice k=0: unary 2 zeros + stop bit.
    hdr = frame_header(3, chan_code=0)
    body = (W().put(0, 1).put(10, 6).put(0, 1)     # FIXED order 2
            .put(3, 16).put(5, 16)                 # warmup
            .put(0, 2).put(0, 4)                   # rice4, 1 partition
            .put(0, 4)                             # k = 0
            .put_unary(2))                         # zigzag(1) = 2
    blob = streaminfo(total=3) + finish_frame(hdr, body)
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [3, 5, 8]


def test_rice_two_partitions_and_escape():
    # block 8, order 0, partition order 1 -> two partitions of 4.
    # partition 1: k=1, values zigzag-coded; partition 2: ESCAPE raw 5 bits
    vals1 = [0, -1, 1, -2]     # zigzag: 0, 1, 2, 3
    vals2 = [7, -8, 3, 0]
    hdr = frame_header(8, chan_code=0)
    body = (W().put(0, 1).put(8, 6).put(0, 1)      # FIXED order 0
            .put(0, 2).put(1, 4)                   # rice4, partition order 1
            .put(1, 4))                            # partition 1: k=1
    for v in vals1:
        zz = (abs(v) << 1) - (1 if v < 0 else 0)
        body.put_unary(zz >> 1).put(zz & 1, 1)
    body.put(15, 4).put(5, 5)                      # partition 2: escape, 5-bit
    for v in vals2:
        body.put(v & 0x1F, 5)
    blob = streaminfo(total=8) + finish_frame(hdr, body)
    ints, _ = decode_ints(blob)
    assert ints.tolist() == vals1 + vals2


def test_rice_escape_zero_width_is_all_zeros():
    hdr = frame_header(4, chan_code=0)
    body = (W().put(0, 1).put(8, 6).put(0, 1)
            .put(0, 2).put(0, 4).put(15, 4).put(0, 5))
    blob = streaminfo(total=4) + finish_frame(hdr, body)
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [0, 0, 0, 0]


def test_lpc_subframe_hand_derived():
    # order 1, coeff 3, shift 1: s[i] = (3 * s[i-1] >> 1) + r[i]
    # warmup [10], residuals [2, -4] -> s = [10, 17, 21]
    hdr = frame_header(3, chan_code=0)
    body = (W().put(0, 1).put(32, 6).put(0, 1)     # LPC order 1
            .put(10, 16)                           # warmup
            .put(3, 4)                             # precision - 1 = 3 (4 bits)
            .put(1, 5)                             # shift 1
            .put(3, 4)                             # coeff 3
            .put(0, 2).put(0, 4).put(0, 4))        # rice k=0
    for v in (2, -4):
        zz = (abs(v) << 1) - (1 if v < 0 else 0)
        body.put_unary(zz)
    blob = streaminfo(total=3) + finish_frame(hdr, body)
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [10, (30 >> 1) + 2, (3 * 17 >> 1) - 4]


def test_wasted_bits_shift_back():
    # verbatim at 15 effective bits with 1 wasted bit: stored [3, -2]
    # decode to [6, -4]
    hdr = frame_header(2, chan_code=0)
    body = W().put(0, 1).put(1, 6).put(1, 1).put_unary(0)
    for s in (3, -2):
        body.put(s & 0x7FFF, 15)
    blob = streaminfo(total=2) + finish_frame(hdr, body)
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [6, -4]


@pytest.mark.parametrize(
    "chan_code,left,right",
    [
        (1, [100, -3], [40, 7]),    # independent stereo
        (8, [5, 6], [3, 10]),       # left/side
        (9, [-100, 0], [77, -1]),   # right/side
        (10, [100, -3], [40, 8]),   # mid/side (odd and even sums)
    ],
)
def test_stereo_decorrelation_exact(chan_code, left, right):
    hdr = frame_header(2, chan_code=chan_code)
    body = W()
    if chan_code == 1:
        subs = [(left, 16), (right, 16)]
    elif chan_code == 8:
        subs = [(left, 16), ([l - r for l, r in zip(left, right)], 17)]
    elif chan_code == 9:
        subs = [([l - r for l, r in zip(left, right)], 17), (right, 16)]
    else:
        subs = [([(l + r) >> 1 for l, r in zip(left, right)], 16),
                ([l - r for l, r in zip(left, right)], 17)]
    for vals, bits in subs:
        body.bits.extend(verbatim(vals, bits).bits)
    blob = streaminfo(channels=2, total=2) + finish_frame(hdr, body)
    mono, _ = decode_flac(blob)
    expect = [(l + r) / 2 / 32768 for l, r in zip(left, right)]
    assert np.allclose(mono, expect, atol=0)


def test_multi_frame_and_short_last_block():
    f0 = finish_frame(frame_header(4, 0, frame_idx=0), verbatim([1, 2, 3, 4], 16))
    f1 = finish_frame(frame_header(2, 0, frame_idx=1), verbatim([5, 6], 16))
    blob = streaminfo(total=6, block=4) + f0 + f1
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [1, 2, 3, 4, 5, 6]


def test_trailing_bytes_after_good_frame_clean_stop():
    f0 = finish_frame(frame_header(2, 0), verbatim([9, -9], 16))
    blob = streaminfo(total=0) + f0 + b"\x00garbage-tag"
    ints, _ = decode_ints(blob)
    assert ints.tolist() == [9, -9]


def test_garbage_on_frame_zero_is_typed():
    with pytest.raises(FlacError):
        decode_flac(streaminfo(total=4) + b"\x12\x34\x56\x78" * 8)


def test_declared_samples_missing_is_typed():
    f0 = finish_frame(frame_header(2, 0), verbatim([9, -9], 16))
    with pytest.raises(FlacError, match="truncated"):
        decode_flac(streaminfo(total=100) + f0)


def test_crc8_and_crc16_mismatches_typed():
    f0 = finish_frame(frame_header(2, 0), verbatim([9, -9], 16))
    base = streaminfo(total=2)
    hdr_crc_off = len(base) + len(frame_header(2, 0)) - 1
    bad8 = bytearray(base + f0)
    bad8[hdr_crc_off] ^= 0xFF
    with pytest.raises(FlacError, match="CRC-8"):
        decode_flac(bytes(bad8))
    bad16 = bytearray(base + f0)
    bad16[-1] ^= 0xFF
    with pytest.raises(FlacError, match="CRC-16"):
        decode_flac(bytes(bad16))


def test_md5_verified_when_present():
    sig = np.arange(-50, 50, dtype=np.int64)
    blob = bytearray(encode_flac(sig, 8000, block_size=64))
    # STREAMINFO MD5 lives in the last 16 bytes of the 38-byte block
    # starting at offset 8; flip one byte of it
    blob[8 + 18] ^= 0x01
    with pytest.raises(FlacError, match="MD5"):
        decode_flac(bytes(blob))


# ---------------------------------------------------------------------------
# production encoder roundtrips (decoder now independently pinned)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("order", [None, 0, 1, 2, 3, 4])
def test_encoder_roundtrip_exact(order):
    rng = np.random.default_rng(42 + (order if order is not None else 9))
    sig = rng.integers(-2000, 2000, 2500).astype(np.int64)
    blob = encode_flac(sig, 16000, block_size=1024, fixed_order=order)
    mono, rate = decode_flac(blob)
    rec = np.rint(mono.astype(np.float64) * 32768).astype(np.int64)
    assert rate == 16000 and np.array_equal(rec, sig)


def test_encoder_roundtrip_smooth_signal_compresses():
    t = np.arange(4096)
    sig = np.rint(3000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    fixed = encode_flac(sig, 16000, fixed_order=2)
    verb = encode_flac(sig, 16000, fixed_order=None)
    assert len(fixed) < len(verb)  # Rice on Δ² beats raw packing
    rec = np.rint(decode_flac(fixed)[0].astype(np.float64) * 32768)
    assert np.array_equal(rec.astype(np.int64), sig)


def test_encoder_rejects_out_of_range():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((2, 2, 2), np.int64), 8000)  # 3-D


def test_parse_flac_header_fields():
    sig = np.arange(300, dtype=np.int64)
    si = parse_flac_header(encode_flac(sig, 22050, block_size=128))
    assert (si.sample_rate, si.channels, si.bits_per_sample) == (22050, 1, 16)
    assert si.total_samples == 300
    assert si.min_block == si.max_block == 128


def test_probe_and_sniff_integration():
    from tulflow_spark.ext.media_codecs import decode_audio, sniff_format
    from tulflow_spark.ext.mediaprobe import probe_media_bytes

    sig = np.arange(-100, 100, dtype=np.int64)
    blob = encode_flac(sig, 8000, block_size=64)
    assert sniff_format(blob) == "flac"
    meta = probe_media_bytes(blob)
    assert meta["codec"] == "flac" and meta["sample_rate"] == 8000
    assert meta["n_frames"] == 200
    assert meta["duration_ms"] == 200 * 1000 // 8000
    mono, rate = decode_audio(blob)
    assert rate == 8000 and len(mono) == 200


def test_not_flac_is_typed():
    with pytest.raises(FlacError, match="magic"):
        parse_flac_header(b"RIFFxxxxWAVE")
    with pytest.raises(FlacError, match="STREAMINFO"):
        # a VORBIS_COMMENT-first stream violates the spec
        parse_flac_header(b"fLaC" + bytes([0x84, 0, 0, 0]))


def test_single_byte_flip_fuzz_never_hangs():
    """Every single-byte corruption must decode, stop cleanly, or raise
    typed — never hang or blow up with a non-FlacError (the Vorbis/MP3
    fuzz discipline)."""
    sig = (np.arange(600, dtype=np.int64) * 37) % 401 - 200
    blob = bytearray(encode_flac(sig, 8000, block_size=256, fixed_order=2))
    for pos in range(len(blob)):
        mutated = bytes(blob[:pos]) + bytes([blob[pos] ^ 0x55]) \
            + bytes(blob[pos + 1 :])
        try:
            decode_flac(mutated)
        except FlacError:
            pass


def test_encoder_stereo_left_side_roundtrip():
    """Stereo encode (left/side decorrelation): decode verifies the
    STREAMINFO MD5 in-path — exact reconstruction of BOTH channels —
    and the mono downmix equals (L+R)/2 bit-for-bit."""
    rng = np.random.default_rng(11)
    left = rng.integers(-3000, 3000, 1500)
    right = rng.integers(-3000, 3000, 1500)
    st = np.stack([left, right], axis=1)
    for order in (None, 2):
        blob = encode_flac(st, 22050, block_size=512, fixed_order=order)
        mono, rate = decode_flac(blob)  # MD5-verified: channels exact
        assert rate == 22050 and len(mono) == 1500
        want = (left + right) / 2.0 / 32768.0
        assert np.allclose(mono.astype(np.float64), want, atol=0)
    si = parse_flac_header(encode_flac(st, 22050, block_size=512))
    assert si.channels == 2 and si.total_samples == 1500


def test_encoder_stereo_shape_wall():
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(np.zeros((10, 3), np.int64), 8000)


def test_encoder_rejects_scalar_input():
    with pytest.raises(ValueError, match="mono or"):
        encode_flac(np.int64(5), 8000)


def test_flac_tags_vorbis_comment_block():
    """Hand-built VORBIS_COMMENT block (LE lengths, KEY=value UTF-8)."""
    def le32(n):
        return n.to_bytes(4, "little")

    comments = [b"TITLE=S\xc3\xb3ng", b"artist=Someone", b"TITLE=dupe",
                b"NOVALUE"]
    body = le32(6) + b"vendor" + le32(len(comments))
    for c in comments:
        body += le32(len(c)) + c
    base = bytearray(encode_flac(np.arange(100, dtype=np.int64), 8000))
    # un-set the STREAMINFO last-block flag, append the comment block
    base[4] &= 0x7F
    blob = bytes(base[:42]) + bytes([0x84]) + len(body).to_bytes(3, "big") \
        + body + bytes(base[42:])
    from tulflow_spark.ext.flac import flac_tags

    tags = flac_tags(blob)
    assert tags["TITLE"] == "Sóng"       # first value wins, key upcased
    assert tags["ARTIST"] == "Someone"
    assert tags["NOVALUE"] == ""
    # the stream still parses and decodes with the extra block
    assert parse_flac_header(blob).total_samples == 100
    assert len(decode_flac(blob)[0]) == 100
    # no comment block -> {}
    assert flac_tags(encode_flac(np.arange(20, dtype=np.int64), 8000)) == {}
    # truncated comment block -> typed
    bad = bytes(base[:42]) + bytes([0x84]) + (len(body)).to_bytes(3, "big") \
        + body[:-3] + bytes(base[42:])
    with pytest.raises(FlacError):
        flac_tags(bad)
