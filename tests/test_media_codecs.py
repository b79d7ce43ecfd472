"""Real stdlib media decode: BMP/PPM/PGM images and PCM WAV audio decode
without Pillow/ffmpeg, with physically meaningful assertions (a pure sine
concentrates energy in the right FFT band; a constant-color image
concentrates the histogram in one bin).  Compressed formats stay a TYPED
wall naming the missing dependency."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from tulflow_spark.ext.media_codecs import (
    UnsupportedMedia,
    audio_band_energies,
    decode_audio,
    decode_image,
    resize_area,
    sniff_format,
    to_gray,
)


def _make_png_raw(
    width: int,
    height: int,
    color_type: int,
    filtered_scanlines: bytes,
    bit_depth: int = 8,
    interlace: int = 0,
    corrupt_idat: bool = False,
) -> bytes:
    """Assemble a PNG from ALREADY-FILTERED scanline bytes, so golden
    tests can pin spec-mandated filter arithmetic without trusting any
    encoder (the fixtures were filtered by hand from the spec)."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    idat = b"not-deflate" if corrupt_idat else zlib.compress(filtered_scanlines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _gif_lzw_encode_literal(indices, min_code: int) -> bytes:
    """Minimal VALID GIF-LZW stream: emit every pixel as a root code (the
    decoder still builds its table, so widths must track its growth), with
    a clear code whenever the simulated table nears the 12-bit cap.
    Independent of the decoder under test — it only mirrors the spec's
    width-growth rule."""
    clear = 1 << min_code
    end = clear + 1
    bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for i in range(width):
            bits.append((code >> i) & 1)

    width = min_code + 1
    table_len = clear + 2
    emit(clear, width)
    prev = False
    for idx in indices:
        if table_len >= 4095:
            emit(clear, width)
            width = min_code + 1
            table_len = clear + 2
            prev = False
        emit(int(idx), width)
        if prev:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        prev = True
    emit(end, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        out.append(b)
    return bytes(out)


def make_gif(indices: np.ndarray, palette: list[tuple[int, int, int]],
             interlaced: bool = False) -> bytes:
    """Assemble a single-frame GIF from an (H, W) index array."""
    h, w = indices.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1 if n > 2 else 0
    size_field = max(size_field, 1)  # >= 4 entries so min_code >= 2
    n_entries = 1 << (size_field + 1)
    gct = b"".join(
        bytes(palette[i]) if i < n else b"\x00\x00\x00"
        for i in range(n_entries)
    )
    min_code = max(2, size_field + 1)
    order = indices
    ipacked = 0
    if interlaced:
        passes = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                  for y in range(s, h, st)]
        order = indices[passes]
        ipacked |= 0x40
    lzw = _gif_lzw_encode_literal(order.reshape(-1).tolist(), min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80 | size_field, 0, 0])
        + gct
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([ipacked, min_code])
        + blocks
        + b"\x3b"
    )


def make_bmp(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BMP from an (H, W, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        img += line
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + info + bytes(img)


def make_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n# comment\n{w} {h}\n255\n".encode() + pixels.tobytes()


def make_wav(samples: np.ndarray, rate: int = 8000,
             channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        ints = np.clip(samples * 32767, -32768, 32767).astype("<i2")
        if channels == 2:
            ints = np.repeat(ints, 2)
        wv.writeframes(ints.tobytes())
    return buf.getvalue()


RGB = np.zeros((6, 8, 3), dtype=np.uint8)
RGB[:, :, 0] = 200  # constant red-ish


class TestImage:
    def test_bmp_roundtrip(self):
        out = decode_image(make_bmp(RGB))
        assert out.shape == (6, 8, 3)
        assert np.array_equal(out, RGB)

    def test_bmp_gradient_orientation(self):
        """Top row must stay the top row through the bottom-up layout."""
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        px[0, :, :] = 255  # bright TOP row
        out = decode_image(make_bmp(px))
        assert out[0].sum() == 255 * 3 * 4
        assert out[-1].sum() == 0

    def test_ppm_roundtrip_with_comment(self):
        out = decode_image(make_ppm(RGB))
        assert np.array_equal(out, RGB)

    def test_pgm(self):
        gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
        data = f"P5\n6 4\n255\n".encode() + gray.tobytes()
        out = decode_image(data)
        assert np.array_equal(out, gray)

    def test_compressed_formats_typed(self):
        with pytest.raises(UnsupportedMedia, match="IHDR"):
            decode_image(b"\x89PNG\r\n\x1a\n....")  # signature, no chunks
        with pytest.raises(UnsupportedMedia, match="jpeg"):
            decode_image(b"\xff\xd8\xff\xe0....")  # SOI then garbage
        with pytest.raises(UnsupportedMedia):
            decode_image(b"garbage-bytes")

    def test_png_gray_golden_all_filters(self):
        # Checked-in scanlines filtered BY HAND from the PNG spec (§9.4):
        # row0 Paeth-with-zero-history (≡ Sub), row1 Average, row2 true
        # Paeth — the expected array below was derived independently of
        # the decoder, so this is a golden byte-exact contract.
        scanlines = bytes(
            [4, 100, 10, 10]  # Paeth, no prior row: predictor = left
            + [3, 55, 8, 8]  # Average: floor((left+up)/2)
            + [4, 95, 10, 10]  # Paeth with full (a,b,c) history
        )
        out = decode_image(_make_png_raw(3, 3, 0, scanlines))
        expect = np.array(
            [[100, 110, 120], [105, 115, 125], [200, 210, 220]], np.uint8
        )
        assert np.array_equal(out, expect)

    def test_png_rgb_golden_sub_and_up(self):
        scanlines = bytes(
            [1, 10, 20, 30, 30, 40, 50]  # Sub: delta vs left pixel
            + [2, 5, 5, 5, 10, 10, 10]  # Up: delta vs row above
        )
        out = decode_image(_make_png_raw(2, 2, 2, scanlines))
        expect = np.array(
            [[[10, 20, 30], [40, 60, 80]], [[15, 25, 35], [50, 70, 90]]],
            np.uint8,
        )
        assert np.array_equal(out, expect)

    def test_png_rgba_unfiltered(self):
        scanlines = bytes([0, 1, 2, 3, 4, 5, 6, 7, 8])
        out = decode_image(_make_png_raw(2, 1, 6, scanlines))
        expect = np.array([[[1, 2, 3, 4], [5, 6, 7, 8]]], np.uint8)
        assert np.array_equal(out, expect)

    def test_png_roundtrip_random(self):
        rng = np.random.default_rng(11)
        for color_type, ch in ((0, 1), (2, 3), (6, 4)):
            shape = (5, 7) if ch == 1 else (5, 7, ch)
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            flat = img.reshape(5, -1)
            scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(5))
            out = decode_image(_make_png_raw(7, 5, color_type, scan))
            assert np.array_equal(out, img), color_type

    def test_png_unsupported_variants_typed(self):
        scan = bytes([0, 0])
        # 16-bit is SUPPORTED since round 6 (TestPng16Bit); other depths
        # and the spec-invalid 16-bit palette stay typed walls
        with pytest.raises(UnsupportedMedia, match="4-bit"):
            decode_image(_make_png_raw(1, 1, 0, scan, bit_depth=4))
        with pytest.raises(UnsupportedMedia, match="16-bit paletted"):
            decode_image(_make_png_raw(1, 1, 3, scan, bit_depth=16))
        # a paletted file without PLTE stays typed
        with pytest.raises(UnsupportedMedia, match="PLTE"):
            decode_image(_make_png_raw(1, 1, 3, scan))
        with pytest.raises(UnsupportedMedia, match="inflate"):
            decode_image(
                _make_png_raw(1, 1, 0, scan, corrupt_idat=True)
            )

    def test_png16_gray_golden_sub_and_up(self):
        """16-bit goldens filtered BY HAND (spec §9: filtering is byte-wise
        with bpp=2 for 16-bit gray; samples are big-endian §7.1)."""
        scanlines = bytes(
            [1, 0x12, 0x34, 0x00, 0x60]  # Sub: P1 = bytes(P0)+(0,0x60)
            + [2, 0x10, 0x00, 0x00, 0x10]  # Up: byte deltas vs row above
        )
        out = decode_image(_make_png_raw(2, 2, 0, scanlines, bit_depth=16))
        expect = np.array(
            [[0x1234, 0x1294], [0x2234, 0x12A4]], np.uint16
        )
        assert out.dtype == np.uint16
        assert np.array_equal(out, expect)

    def test_png16_filtering_is_bytewise_not_samplewise(self):
        """Discriminating golden: Sub across a low-byte overflow.  P0 =
        0x00FF, stored second-pixel deltas (0x01, 0x01) byte-wise give
        P1 = 0x0100; a (wrong) sample-wise Sub would yield 0x0200."""
        scanlines = bytes([1, 0x00, 0xFF, 0x01, 0x01])
        out = decode_image(_make_png_raw(2, 1, 0, scanlines, bit_depth=16))
        assert np.array_equal(out, np.array([[0x00FF, 0x0100]], np.uint16))

    def test_png16_rgb_rgba_roundtrip_random(self):
        rng = np.random.default_rng(13)
        for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
            shape = (5, 7) if ch == 1 else (5, 7, ch)
            img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
            flat = img.reshape(5, -1)
            scan = b"".join(
                b"\x00" + flat[y].astype(">u2").tobytes() for y in range(5)
            )
            out = decode_image(
                _make_png_raw(7, 5, color_type, scan, bit_depth=16)
            )
            assert out.dtype == np.uint16
            assert np.array_equal(out, img), color_type

    def test_png16_adam7_interlaced(self):
        """2x2 16-bit gray Adam7: passes 1/6/7 carry one, one, and two
        pixels respectively (pass origins from spec §8.2)."""
        a, b, c, d = 0x0102, 0x0304, 0x0506, 0x0708
        scan = (
            bytes([0]) + struct.pack(">H", a)      # pass 1 → (0,0)
            + bytes([0]) + struct.pack(">H", b)    # pass 6 → (0,1)
            + bytes([0]) + struct.pack(">2H", c, d)  # pass 7 → (1,0),(1,1)
        )
        out = decode_image(
            _make_png_raw(2, 2, 0, scan, bit_depth=16, interlace=1)
        )
        assert np.array_equal(out, np.array([[a, b], [c, d]], np.uint16))

    def test_gif_golden_handpacked_bytes(self):
        # 2x2, 4-entry palette, pixels [0,1,1,0]; the LZW stream below was
        # bit-packed BY HAND from the spec (clear=4 end=5, width 3 growing
        # to 4 after the table reaches 8) — a golden byte-exact contract
        # independent of any encoder
        gif = (
            b"GIF89a"
            + struct.pack("<HH", 2, 2)
            + bytes([0x91, 0, 0])
            + bytes([255, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
            + bytes([0, 2])            # no LCT; min code size 2
            + bytes([3, 0x44, 0x02, 0x05, 0])  # hand-packed LZW
            + b"\x3b"
        )
        out = decode_image(gif)
        expect = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 255, 0], [255, 0, 0]]],
            np.uint8,
        )
        assert np.array_equal(out, expect)

    def test_gif_roundtrip_random(self):
        rng = np.random.default_rng(13)
        palette = [(i * 17 % 256, i * 41 % 256, i * 89 % 256)
                   for i in range(8)]
        idx = rng.integers(0, 8, size=(9, 13), dtype=np.uint8)
        out = decode_image(make_gif(idx, palette))
        expect = np.array(palette, np.uint8)[idx]
        assert np.array_equal(out, expect)

    def test_gif_interlaced(self):
        rng = np.random.default_rng(29)
        palette = [(0, 0, 0), (255, 255, 255), (128, 0, 128), (0, 128, 0)]
        idx = rng.integers(0, 4, size=(11, 5), dtype=np.uint8)
        out = decode_image(make_gif(idx, palette, interlaced=True))
        expect = np.array(palette, np.uint8)[idx]
        assert np.array_equal(out, expect)

    def test_gif_truncated_typed(self):
        with pytest.raises(UnsupportedMedia):
            decode_image(b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00\x00")

    def test_sniff(self):
        assert sniff_format(make_bmp(RGB)) == "bmp"
        assert sniff_format(make_wav(np.zeros(8))) == "wav"
        assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"

    def test_resize_area_box_average(self):
        img = np.array([[0, 0, 100, 100],
                        [0, 0, 100, 100]], dtype=np.float32)
        out = resize_area(img, 2, 1)
        assert out.shape == (1, 2)
        assert out[0, 0] == 0.0 and out[0, 1] == 100.0

    def test_to_gray_luma(self):
        px = np.zeros((1, 1, 3), dtype=np.uint8)
        px[0, 0] = (255, 0, 0)
        assert abs(float(to_gray(px)[0, 0]) - 0.299 * 255) < 0.5


class TestAudio:
    def test_wav_roundtrip_mono(self):
        t = np.arange(8000) / 8000.0
        sine = 0.5 * np.sin(2 * np.pi * 440 * t)
        samples, rate = decode_audio(make_wav(sine))
        assert rate == 8000
        assert len(samples) == 8000
        assert np.abs(samples - sine).max() < 1e-3

    def test_wav_stereo_downmix(self):
        samples, rate = decode_audio(
            make_wav(np.ones(100) * 0.25, channels=2)
        )
        assert len(samples) == 100
        assert abs(samples.mean() - 0.25) < 1e-3

    def test_sine_concentrates_in_fft_band(self):
        """A 1.1 kHz tone at 8 kHz sample rate lands in band
        1100/4000*16 ≈ 4 of 16 — the feature must say so."""
        t = np.arange(8000) / 8000.0
        sine = np.sin(2 * np.pi * 1100 * t)
        feats = audio_band_energies(sine.astype(np.float32), 16)
        assert feats.argmax() == 4
        assert feats[4] > 0.9

    def test_compressed_audio_typed(self):
        # ID3-prefixed bytes route to the native MP3 decoder (r8); junk
        # after the tag is a typed mp3 error, not an ffmpeg wall
        with pytest.raises(UnsupportedMedia, match="mp3"):
            decode_audio(b"ID3\x04\x00....")
        with pytest.raises(UnsupportedMedia):
            decode_audio(b"not-audio")
        # Opus/MP4 remain typed walls naming the dependency
        with pytest.raises(UnsupportedMedia, match="ffmpeg"):
            decode_audio(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16)


class TestSparkPipeline:
    def test_native_image_featurize(self, spark):
        from tulflow_spark.ext.multimodal import decode_and_featurize

        rows = [
            (1, "image", make_bmp(RGB), None),
            (2, "image", make_ppm(np.full((3, 5, 3), 10, np.uint8)), None),
        ]
        df = spark.createDataFrame(
            rows,
            "media_id bigint, kind string, content binary, meta string",
        )
        out = {
            r.media_id: r
            for r in decode_and_featurize(df, decoder="native").collect()
        }
        assert (out[1].width, out[1].height) == (8, 6)   # SOURCE dims
        assert (out[2].width, out[2].height) == (5, 3)
        # constant-color image → histogram mass in exactly one bin
        assert max(out[2].features) == pytest.approx(1.0)
        assert sum(out[1].features) == pytest.approx(1.0)

    def test_native_audio_featurize(self, spark):
        from tulflow_spark.ext.multimodal import decode_audio_features

        t = np.arange(4000) / 8000.0
        rows = [(7, bytes(make_wav(np.sin(2 * np.pi * 1100 * t))))]
        df = spark.createDataFrame(rows, "media_id bigint, content binary")
        r = decode_audio_features(df, decoder="native").collect()[0]
        assert r.sample_rate == 8000
        assert r.duration_ms == 500
        assert r.n_samples == 4000
        assert int(np.argmax(r.features)) == 4

    def test_native_decoder_typed_failure_on_compressed(self, spark):
        # mp4 remains a real wall (codec work a container without ffmpeg
        # cannot do); the error must surface executor-side with the
        # dependency named
        from tulflow_spark.ext.multimodal import decode_and_featurize

        df = spark.createDataFrame(
            [(1, "image", b"\x00\x00\x00\x18ftypmp42xxxx", None)],
            "media_id bigint, kind string, content binary, meta string",
        )
        with pytest.raises(Exception, match="ffmpeg"):
            decode_and_featurize(df, decoder="native").collect()


class TestPngAdam7Palette:
    """Palette lookup (PLTE/tRNS) and Adam7 deinterlacing goldens — the
    expected arrays are derived BY HAND from the spec's pass layout."""

    def _palette_png(self, w, h, indices, palette, trns=None):
        import struct as s_, zlib

        def chunk(tag, body):
            return (s_.pack(">I", len(body)) + tag + body
                    + s_.pack(">I", zlib.crc32(tag + body)))

        ihdr = s_.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        raw = b"".join(
            b"\x00" + bytes(indices[y * w:(y + 1) * w]) for y in range(h)
        )
        out = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", bytes(sum(palette, ()))))
        if trns is not None:
            out += chunk(b"tRNS", bytes(trns))
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    def test_palette_lookup(self):
        pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
        img = decode_image(self._palette_png(2, 2, [0, 1, 2, 0], pal))
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 0]) == (255, 0, 0)
        assert tuple(img[0, 1]) == (0, 255, 0)
        assert tuple(img[1, 0]) == (0, 0, 255)

    def test_palette_trns_alpha(self):
        pal = [(10, 20, 30), (40, 50, 60)]
        img = decode_image(
            self._palette_png(2, 1, [0, 1], pal, trns=[128])
        )
        assert img.shape == (1, 2, 4)
        assert tuple(img[0, 0]) == (10, 20, 30, 128)
        assert tuple(img[0, 1]) == (40, 50, 60, 255)  # beyond tRNS → opaque

    def test_palette_index_out_of_range_typed(self):
        with pytest.raises(UnsupportedMedia, match="palette index"):
            decode_image(self._palette_png(1, 1, [5], [(1, 2, 3)]))

    def _adam7_png(self, w, h, value_of):
        """Interlaced grayscale PNG whose pixel (x,y) = value_of(x,y),
        with the seven passes serialized in spec order by THIS test."""
        import struct as s_, zlib

        def chunk(tag, body):
            return (s_.pack(">I", len(body)) + tag + body
                    + s_.pack(">I", zlib.crc32(tag + body)))

        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for py in range(ph):
                raw.append(0)  # filter None
                for px in range(pw):
                    raw.append(value_of(x0 + px * dx, y0 + py * dy))
        ihdr = s_.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    def test_adam7_8x8_position_encoding(self):
        # pixel value = 16*y + x: every pass scatters to the right place
        img = decode_image(self._adam7_png(8, 8, lambda x, y: 16 * y + x))
        import numpy as np

        want = np.add.outer(16 * np.arange(8), np.arange(8)).astype(np.uint8)
        assert np.array_equal(img, want)

    def test_adam7_odd_dimensions(self):
        # 5x3: several passes are empty or partial
        img = decode_image(self._adam7_png(5, 3, lambda x, y: 10 * y + x))
        assert img.shape == (3, 5)
        assert img[2, 4] == 24 and img[0, 0] == 0 and img[1, 3] == 13


class TestGrayAndFeatures16:
    def test_to_gray_16bit_rescales_to_8bit_range(self):
        from tulflow_spark.ext.media_codecs import to_gray

        g16 = np.array([[0, 0xFFFF], [0x8080, 0x0101]], np.uint16)
        g = to_gray(g16)
        assert g.dtype == np.float32
        assert np.allclose(g, [[0.0, 255.0], [128.0, 1.0]], atol=1e-3)

    def test_to_gray_gray_alpha_uses_luma_channel(self):
        from tulflow_spark.ext.media_codecs import to_gray

        ga = np.dstack([
            np.array([[10, 20]], np.uint8),
            np.array([[255, 0]], np.uint8),
        ])
        assert np.array_equal(to_gray(ga), np.array([[10.0, 20.0]], np.float32))
