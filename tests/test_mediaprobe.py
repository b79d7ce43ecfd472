"""Header-level media probing: MP4 box walk + sample tables, MP3 frame
walk, image-dimension probes.  The MP4/MP3 fixtures are built by
independent in-test writers straight from the public specs (ISO 14496-12
box layout; ISO 11172-3 header fields), so the decoder can't be "tested
against itself"."""

from __future__ import annotations

import struct

import pytest

from tulflow_spark.ext.media_codecs import UnsupportedMedia
from tulflow_spark.ext.mediaprobe import (
    mp4_sample_at,
    probe_media_bytes,
    probe_mp3,
    probe_mp4,
)

# ---------------------------------------------------------------------------
# in-test MP4 writer (boxes laid out by hand)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + body)


def make_mp4(
    frames: list[bytes],
    timescale: int = 1000,
    frame_delta: int = 40,  # 25 fps in a 1000 timescale
    width: int = 64,
    height: int = 48,
    sync: list[int] | None = None,  # 1-based keyframe sample numbers
    chunks: list[int] | None = None,  # frames per chunk; default all-in-one
) -> bytes:
    """Minimal ftyp+moov+mdat file with one 'vide' track whose sample table
    places every frame payload at a known mdat offset."""
    n = len(frames)
    duration = n * frame_delta
    chunks = chunks or [n]
    assert sum(chunks) == n

    mvhd = _full(
        b"mvhd",
        struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate
        + b"\x00" * 6  # volume + reserved
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"probe\x00"
    )
    # stsd with a fake 'fake' sample entry (only fourcc is read for video)
    entry = _box(b"fake", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, frame_delta))
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    # stsc: runs of frames-per-chunk
    runs = []
    first = 1
    for i, c in enumerate(chunks):
        if i == 0 or c != chunks[i - 1]:
            runs.append((first, c))
        first += 1
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stss_box = b""
    if sync is not None:
        stss_box = _full(
            b"stss",
            struct.pack(">I", len(sync)) + b"".join(struct.pack(">I", s) for s in sync),
        )

    # chunk offsets depend on final layout: build everything with a stco
    # placeholder, then patch.
    def build(chunk_offsets: list[int]) -> bytes:
        stco = _full(
            b"stco",
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss_box)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        mdat = _box(b"mdat", b"".join(frames))
        return ftyp + moov + mdat

    placeholder = build([0] * len(chunks))
    mdat_body = placeholder.rindex(b"mdat") + 4
    offsets = []
    pos = mdat_body
    fi = 0
    for c in chunks:
        offsets.append(pos)
        for _ in range(c):
            pos += len(frames[fi])
            fi += 1
    out = build(offsets)
    assert len(out) == len(placeholder)
    return out


def test_mp4_probe_metadata():
    frames = [b"AAAA", b"BBBBBB", b"CC", b"DDDDD"]
    data = make_mp4(frames, width=320, height=240)
    info = probe_mp4(data)
    assert info.brand == "isom"
    assert info.timescale == 1000 and info.duration == 160
    assert info.duration_ms == 160
    (tr,) = info.tracks
    assert tr.handler == "vide" and tr.codec == "fake"
    assert (tr.width, tr.height) == (320, 240)
    assert tr.sample_sizes == [4, 6, 2, 5]
    assert tr.sample_times == [0, 40, 80, 120]


def test_mp4_sample_offsets_resolve_payloads():
    frames = [b"frame0!", b"frame1!!", b"frame2", b"frame3##"]
    data = make_mp4(frames)
    (tr,) = probe_mp4(data).tracks
    for i, f in enumerate(frames):
        off, size = tr.sample_offsets[i], tr.sample_sizes[i]
        assert data[off : off + size] == f


def test_mp4_multi_chunk_offsets():
    frames = [b"k0", b"k111", b"k22222", b"k3", b"k44"]
    data = make_mp4(frames, chunks=[2, 2, 1])
    (tr,) = probe_mp4(data).tracks
    for i, f in enumerate(frames):
        off, size = tr.sample_offsets[i], tr.sample_sizes[i]
        assert data[off : off + size] == f


def test_mp4_sample_at_timestamp_and_keyframe_snap():
    frames = [b"IDR0", b"p1", b"p2", b"IDR3", b"p4"]
    data = make_mp4(frames, frame_delta=40, sync=[1, 4])
    (tr,) = probe_mp4(data).tracks
    idx, ts, payload = mp4_sample_at(data, tr, 85)  # 85ms → sample 2 (80ms)
    assert (idx, ts, payload) == (2, 80, b"p2")
    idx, ts, payload = mp4_sample_at(data, tr, 85, keyframe_only=True)
    assert (idx, ts, payload) == (0, 0, b"IDR0")
    idx, ts, payload = mp4_sample_at(data, tr, 170, keyframe_only=True)
    assert (idx, ts, payload) == (3, 120, b"IDR3")


def test_mp4_no_moov_is_typed():
    data = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"mdat", b"xx")
    with pytest.raises(UnsupportedMedia, match="moov"):
        probe_mp4(data)


# ---------------------------------------------------------------------------
# in-test MP3 writer
# ---------------------------------------------------------------------------


def make_mp3_frames(
    n: int, kbps: int = 128, rate: int = 44100, pad_every: int = 0
) -> bytes:
    """Valid MPEG1 Layer III headers with zeroed payloads.  Frame length =
    144*bitrate/rate + padding (spec formula, independent of the module)."""
    br_table = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    sr_table = [44100, 48000, 32000]
    out = bytearray()
    for i in range(n):
        padding = 1 if pad_every and (i % pad_every == 0) else 0
        hdr = (
            0x7FF << 21
            | 0x3 << 19  # MPEG1
            | 0x1 << 17  # Layer III
            | 0x1 << 16  # no CRC
            | br_table.index(kbps) << 12
            | sr_table.index(rate) << 10
            | padding << 9
            | 0x0 << 6  # stereo
        )
        frame_len = 144 * kbps * 1000 // rate + padding
        out += struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
    return bytes(out)


def test_mp3_frame_walk_exact_count_and_duration():
    data = make_mp3_frames(38, kbps=128, rate=44100)
    info = probe_mp3(data)
    assert info.n_frames == 38
    assert info.sample_rate == 44100
    assert info.bitrate_kbps == 128.0
    assert not info.vbr
    # 38 frames * 1152 samples / 44100 Hz = 992.65.. ms
    assert info.duration_ms == 38 * 1152 * 1000 // 44100


def test_mp3_id3_prefix_and_padding_bit():
    body = make_mp3_frames(10, kbps=64, rate=32000, pad_every=3)
    sz = 200
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + b"\x00" * sz
    info = probe_mp3(id3 + body)
    assert info.n_frames == 10 and info.sample_rate == 32000


def test_mp3_vbr_mixed_bitrates():
    data = make_mp3_frames(4, kbps=128) + make_mp3_frames(4, kbps=192)
    info = probe_mp3(data)
    assert info.vbr and info.n_frames == 8
    assert info.bitrate_kbps == pytest.approx(160.0)


def test_mp3_garbage_is_typed():
    with pytest.raises(UnsupportedMedia):
        probe_mp3(b"\x00" * 64)


# ---------------------------------------------------------------------------
# probe_media_bytes dispatch
# ---------------------------------------------------------------------------


def test_probe_image_headers():
    from tests.test_media_codecs import _make_png_raw

    png = _make_png_raw(5, 3, 0, b"".join(b"\x00" + b"\x10" * 5 for _ in range(3)))
    m = probe_media_bytes(png)
    assert (m["format"], m["width"], m["height"]) == ("png", 5, 3)

    bmp_hdr = (
        b"BM" + struct.pack("<IHHI", 122, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 7, 4, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    m = probe_media_bytes(bmp_hdr + b"\x00" * 96)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 7, 4)

    m = probe_media_bytes(b"P5 9 6 255\n" + b"\x00" * 54)
    assert (m["format"], m["width"], m["height"]) == ("pgm", 9, 6)


def test_probe_jpeg_sof_dims():
    from tests.test_jpeg import _encode_dc_only
    import numpy as np

    data = _encode_dc_only([np.zeros((16, 24))])
    m = probe_media_bytes(data)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 24, 16)


def test_probe_wav_duration():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00" * 4000)  # 500 ms
    m = probe_media_bytes(buf.getvalue())
    assert m["format"] == "wav"
    assert m["sample_rate"] == 8000 and m["duration_ms"] == 500


def test_probe_mp4_fills_video_meta():
    data = make_mp4([b"x" * 10] * 25, width=640, height=360)
    m = probe_media_bytes(data)
    assert m["format"] == "mp4"
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_frames"] == 25 and m["duration_ms"] == 1000
    assert m["codec"] == "fake"


# ---------------------------------------------------------------------------
# in-test Ogg writer (RFC 3533 pages built by hand)
# ---------------------------------------------------------------------------


def _ogg_page(granule: int, serial: int, seq: int, payload: bytes,
              header_type: int = 0) -> bytes:
    segs = []
    rest = len(payload)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (
        b"OggS" + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC (probe does not verify)
        + bytes([len(segs)]) + bytes(segs)
        + payload
    )


def make_ogg_vorbis(rate: int, channels: int, total_samples: int) -> bytes:
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", rate) + b"\x00" * 16 + b"\x01"
    )
    return (
        _ogg_page(0, 7, 0, ident, header_type=2)
        + _ogg_page(total_samples // 2, 7, 1, b"\x00" * 64)
        + _ogg_page(total_samples, 7, 2, b"\x00" * 64, header_type=4)
    )


def make_ogg_opus(preskip: int, granule_end: int) -> bytes:
    head = (
        b"OpusHead" + bytes([1, 2])  # version, channels
        + struct.pack("<H", preskip)
        + struct.pack("<I", 48000)
        + struct.pack("<h", 0) + bytes([0])
    )
    return (
        _ogg_page(0, 9, 0, head, header_type=2)
        + _ogg_page(granule_end, 9, 1, b"\x00" * 32, header_type=4)
    )


def test_ogg_vorbis_duration_from_last_granule():
    from tulflow_spark.ext.mediaprobe import probe_ogg

    data = make_ogg_vorbis(44100, 2, total_samples=44100 * 3)
    info = probe_ogg(data)
    assert info.codec == "vorbis"
    assert info.sample_rate == 44100 and info.channels == 2
    assert info.duration_ms == 3000
    assert info.n_pages == 3


def test_ogg_opus_preskip_subtracted():
    from tulflow_spark.ext.mediaprobe import probe_ogg

    data = make_ogg_opus(preskip=312, granule_end=48000 + 312)
    info = probe_ogg(data)
    assert info.codec == "opus" and info.channels == 2
    assert info.duration_ms == 1000  # (granule - preskip) / 48k


def test_ogg_probe_media_dispatch():
    m = probe_media_bytes(make_ogg_vorbis(8000, 1, 4000))
    assert m["format"] == "ogg" and m["codec"] == "vorbis"
    assert m["sample_rate"] == 8000 and m["duration_ms"] == 500


def test_ogg_garbage_typed():
    from tulflow_spark.ext.mediaprobe import probe_ogg

    with pytest.raises(UnsupportedMedia):
        probe_ogg(b"not an ogg at all")


# ---------------------------------------------------------------------------
# fragmented MP4 (in-test fMP4 writer: moov has no samples; moof/trun do)
# ---------------------------------------------------------------------------


def make_fmp4(fragments: list[list[bytes]], timescale: int = 1000,
              delta: int = 40, width: int = 48, height: int = 32) -> bytes:
    """init segment (moov with empty stbl + trex defaults) followed by one
    moof+mdat per fragment, per-sample sizes in trun, default-base-is-moof."""
    mvhd = _full(b"mvhd", struct.pack(">II", 0, 0)
                 + struct.pack(">II", timescale, 0)
                 + struct.pack(">I", 0x00010000) + b"\x00" * 6 + b"\x00" * 8
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", struct.pack(">II", 0, 0) + struct.pack(">I", 1)
                 + struct.pack(">I", 0) + struct.pack(">I", 0) + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", struct.pack(">II", 0, 0)
                 + struct.pack(">II", timescale, 0)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"f\x00")
    entry = _box(b"fake", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd
                + _full(b"stts", struct.pack(">I", 0))
                + _full(b"stsc", struct.pack(">I", 0))
                + _full(b"stsz", struct.pack(">II", 0, 0))
                + _full(b"stco", struct.pack(">I", 0)))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(b"trex", struct.pack(">5I", 1, 1, delta, 0, 0))
    mvex = _box(b"mvex", trex)
    moov = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5dash")
    out = bytearray(ftyp + moov)

    t = 0
    for seq, frames in enumerate(fragments, start=1):
        mfhd = _full(b"mfhd", struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x20000), no explicit defaults
        tfhd = _box(b"tfhd", bytes([0, 0x02, 0x00, 0x00]) + struct.pack(">I", 1))
        tfdt = _box(b"tfdt", bytes([1, 0, 0, 0]) + struct.pack(">Q", t))
        # trun: data-offset (0x1) + sample-size (0x200)
        trun_body = bytes([0, 0x00, 0x02, 0x01]) + struct.pack(">I", len(frames))
        # placeholder data offset patched below
        trun_body += struct.pack(">i", 0)
        trun_body += b"".join(struct.pack(">I", len(f)) for f in frames)
        trun = _box(b"trun", trun_body)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        # data offset = moof start → first payload byte (moof size + mdat hdr)
        data_off = len(moof) + 8
        moof = bytearray(moof)
        # trun data_offset field: locate it (after moof hdr+mfhd+traf hdr+tfhd+tfdt+trun hdr+flags+count)
        idx = moof.rindex(struct.pack(">i", 0) + struct.pack(">I", len(frames[0])))
        moof[idx : idx + 4] = struct.pack(">i", data_off)
        mdat = _box(b"mdat", b"".join(frames))
        out += bytes(moof) + mdat
        t += delta * len(frames)
    return bytes(out)


def test_fmp4_fragments_resolve_samples():
    frags = [[b"F0!", b"F1!!!"], [b"F2", b"F3####", b"F4!"]]
    data = make_fmp4(frags)
    info = probe_mp4(data)
    (tr,) = info.tracks
    flat = [f for fr in frags for f in fr]
    assert tr.sample_sizes == [len(f) for f in flat]
    assert tr.sample_times == [0, 40, 80, 120, 160]
    for i, f in enumerate(flat):
        off, size = tr.sample_offsets[i], tr.sample_sizes[i]
        assert data[off : off + size] == f, i
    assert tr.duration == 200  # extended by the fragment walk


def make_fmp4_multirun(runs: list[list[bytes]], delta: int = 40) -> bytes:
    """One moof whose single traf carries MULTIPLE trun boxes (ISO
    14496-12 §8.8.8): the first run has an explicit data-offset, later runs
    omit the flag and continue contiguously after the previous run."""
    init = make_fmp4([])  # ftyp+moov only (trex default duration = delta)

    def build(data_off: int) -> bytes:
        mfhd = _full(b"mfhd", struct.pack(">I", 1))
        tfhd = _box(b"tfhd", bytes([0, 0x02, 0x00, 0x00]) + struct.pack(">I", 1))
        tfdt = _box(b"tfdt", bytes([1, 0, 0, 0]) + struct.pack(">Q", 0))
        truns = b""
        for i, frames in enumerate(runs):
            if i == 0:  # data-offset (0x1) + sample-size (0x200)
                body = bytes([0, 0x00, 0x02, 0x01])
                body += struct.pack(">I", len(frames))
                body += struct.pack(">i", data_off)
            else:  # sample-size only: contiguous continuation
                body = bytes([0, 0x00, 0x02, 0x00])
                body += struct.pack(">I", len(frames))
            body += b"".join(struct.pack(">I", len(f)) for f in frames)
            truns += _box(b"trun", body)
        traf = _box(b"traf", tfhd + tfdt + truns)
        return _box(b"moof", mfhd + traf)

    moof = build(0)
    moof = build(len(moof) + 8)  # moof start -> first mdat payload byte
    payload = b"".join(f for fr in runs for f in fr)
    return init + moof + _box(b"mdat", payload)


def test_fmp4_multiple_trun_per_traf():
    """All trun boxes in a traf must contribute samples — a single-_find
    walk silently drops every run after the first (r5 ADVICE)."""
    runs = [[b"R0a!", b"R0bb"], [b"R1ccc"], [b"R2d", b"R2ee!!"]]
    data = make_fmp4_multirun(runs)
    (tr,) = probe_mp4(data).tracks
    flat = [f for r in runs for f in r]
    assert tr.sample_sizes == [len(f) for f in flat]
    assert tr.sample_times == [0, 40, 80, 120, 160]
    for i, f in enumerate(flat):
        off, size = tr.sample_offsets[i], tr.sample_sizes[i]
        assert data[off : off + size] == f, i
    assert tr.duration == 200


def test_fmp4_sample_at_works_across_fragments():
    frags = [[b"AA", b"BB"], [b"CC", b"DD"]]
    data = make_fmp4(frags)
    (tr,) = probe_mp4(data).tracks
    idx, ts, payload = mp4_sample_at(data, tr, 100)
    assert (idx, ts, payload) == (2, 80, b"CC")


def _id3_frame(fid: bytes, text: str, v4: bool = False) -> bytes:
    body = b"\x03" + text.encode("utf-8")
    if v4:
        n = len(body)
        size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    else:
        size = struct.pack(">I", len(body))
    return fid + size + b"\x00\x00" + body


def make_id3v2(frames: list[tuple[bytes, str]], version: int = 3) -> bytes:
    body = b"".join(_id3_frame(f, t, v4=(version == 4)) for f, t in frames)
    body += b"\x00" * 20  # padding
    n = len(body)
    size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3" + bytes([version, 0, 0]) + size + body


def test_id3v2_text_frames():
    from tulflow_spark.ext.mediaprobe import parse_id3v2

    tag = make_id3v2([(b"TIT2", "Some Title"), (b"TPE1", "The Artist"),
                      (b"TALB", "An Album")])
    got = parse_id3v2(tag + make_mp3_frames(3))
    assert got == {"TIT2": "Some Title", "TPE1": "The Artist",
                   "TALB": "An Album"}


def test_id3v2_v4_syncsafe_sizes():
    from tulflow_spark.ext.mediaprobe import parse_id3v2

    tag = make_id3v2([(b"TIT2", "x" * 200)], version=4)
    assert parse_id3v2(tag)["TIT2"] == "x" * 200


def test_id3v2_absent_returns_empty():
    from tulflow_spark.ext.mediaprobe import parse_id3v2

    assert parse_id3v2(make_mp3_frames(2)) == {}


# ---------------------------------------------------------------------------
# MPEG Layer I/II probe coverage (r8 ADVICE: the strict Layer III sniff
# narrowed probing; restored via a two-consecutive-header rule)
# ---------------------------------------------------------------------------


def make_mpeg_frames(n, layer, kbps, rate, version=3, mode=3):
    """Hand-built MPEG1/2 Layer I/II/III frames (header + zero payload)."""
    from tulflow_spark.ext.media_codecs import _MPEG_KBPS, _MPEG_RATES

    br_idx = _MPEG_KBPS[(version == 3, layer)].index(kbps)
    sr_idx = _MPEG_RATES[version].index(rate)
    out = bytearray()
    for _ in range(n):
        hdr = (
            0x7FF << 21
            | version << 19
            | (4 - layer) << 17
            | 0x1 << 16  # no CRC
            | br_idx << 12
            | sr_idx << 10
            | 0 << 9     # no padding
            | mode << 6
        )
        if layer == 1:
            frame_len = (12 * kbps * 1000 // rate) * 4
        else:
            spf = 1152 if (layer == 2 or version == 3) else 576
            frame_len = spf // 8 * kbps * 1000 // rate
        out += struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
    return bytes(out)


def test_layer2_stream_probes():
    from tulflow_spark.ext.media_codecs import sniff_format

    data = make_mpeg_frames(5, layer=2, kbps=64, rate=44100)
    assert sniff_format(data) == "mp3"
    info = probe_mp3(data)
    assert info.layer == 2 and info.n_frames == 5
    assert info.sample_rate == 44100 and info.channels == 1
    assert info.duration_ms == 5 * 1152 * 1000 // 44100
    meta = probe_media_bytes(data)
    assert meta["codec"] == "mpeg-L2" and meta["n_frames"] == 5


def test_layer1_mpeg2_stream_probes():
    from tulflow_spark.ext.media_codecs import sniff_format

    data = make_mpeg_frames(4, layer=1, kbps=144, rate=22050, version=2)
    assert sniff_format(data) == "mp3"
    info = probe_mp3(data)
    assert info.layer == 1 and info.n_frames == 4
    # Layer I: 384 samples per frame regardless of version
    assert info.duration_ms == 4 * 384 * 1000 // 22050


def test_single_layer1_sync_in_text_stays_unknown():
    """UTF-16LE text starts FF FE — a valid Layer I sync with plausible
    header bytes; without a second consistent frame header it must not
    sniff as audio (the r8 false-positive fix, preserved)."""
    from tulflow_spark.ext.media_codecs import sniff_format

    text = "Hello, world — plain UTF-16 text".encode("utf-16-le")
    assert sniff_format(b"\xff\xfe" + text) == "unknown"


def test_single_layer3_header_still_sniffs():
    """A lone Layer III frame keeps its r8 single-header rule."""
    from tulflow_spark.ext.media_codecs import sniff_format

    one = make_mp3_frames(1, kbps=128, rate=44100)
    assert sniff_format(one) == "mp3"


def test_mpeg_audio_header_reserved_fields_rejected():
    from tulflow_spark.ext.media_codecs import mpeg_audio_header

    good = make_mpeg_frames(1, layer=2, kbps=64, rate=44100)
    assert mpeg_audio_header(good) is not None
    bad_ver = bytes([good[0], (good[1] & ~0x18) | 0x08, good[2], good[3]])
    assert mpeg_audio_header(bad_ver) is None       # reserved version
    bad_layer = bytes([good[0], good[1] & ~0x06, good[2], good[3]])
    assert mpeg_audio_header(bad_layer) is None     # reserved layer
    free = bytes([good[0], good[1], good[2] & 0x0F, good[3]])
    assert mpeg_audio_header(free) is None          # free-format
    bad_sr = bytes([good[0], good[1], good[2] | 0x0C, good[3]])
    assert mpeg_audio_header(bad_sr) is None        # reserved rate


def test_mp3_parameter_change_clean_stop():
    """Review r9 (high): stitched segments with different version/layer/
    rate stop the walk at the boundary instead of misstating duration."""
    head = make_mpeg_frames(3, layer=3, kbps=64, rate=16000, version=2)
    tail = make_mpeg_frames(3, layer=3, kbps=128, rate=44100, version=3)
    info = probe_mp3(head + tail)
    assert info.n_frames == 3 and info.sample_rate == 16000
    assert info.duration_ms == 3 * 576 * 1000 // 16000


def test_flac_probe_giant_total_samples_degrades():
    """Review r9 (high): a >2^31-sample STREAMINFO must not overflow the
    int32 n_frames probe column — degrade to None, keep duration."""
    from tests.test_flac import streaminfo

    blob = streaminfo(rate=44100, total=2**33)
    meta = probe_media_bytes(blob + b"")
    assert meta["n_frames"] is None
    assert meta["duration_ms"] == 2**33 * 1000 // 44100
