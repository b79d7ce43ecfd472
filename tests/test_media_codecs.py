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
        with pytest.raises(UnsupportedMedia, match="Pillow"):
            decode_image(b"\xff\xd8\xff\xe0....")
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
        with pytest.raises(UnsupportedMedia, match="16-bit"):
            decode_image(_make_png_raw(1, 1, 0, scan, bit_depth=16))
        with pytest.raises(UnsupportedMedia, match="Adam7"):
            decode_image(_make_png_raw(1, 1, 0, scan, interlace=1))
        with pytest.raises(UnsupportedMedia, match="palette"):
            decode_image(_make_png_raw(1, 1, 3, scan))
        with pytest.raises(UnsupportedMedia, match="inflate"):
            decode_image(
                _make_png_raw(1, 1, 0, scan, corrupt_idat=True)
            )

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
        with pytest.raises(UnsupportedMedia, match="ffmpeg"):
            decode_audio(b"ID3\x04\x00....")
        with pytest.raises(UnsupportedMedia):
            decode_audio(b"not-audio")


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
        from tulflow_spark.ext.multimodal import decode_and_featurize

        df = spark.createDataFrame(
            [(1, "image", b"\xff\xd8\xff\xe0JFIFxxxx", None)],
            "media_id bigint, kind string, content binary, meta string",
        )
        with pytest.raises(Exception, match="Pillow"):
            decode_and_featurize(df, decoder="native").collect()
