"""Pure-numpy media codec tests (functions/media.py) — no Ray needed."""
import numpy as np
import pytest

from link_profiler_repo_ray.functions import media


class TestBmp:
    def test_round_trip(self):
        b = media.encode_bmp(19, 7, 40)  # stride-padded width (3*19=57 -> 60)
        f = media.decode_bmp(b)
        assert f["width"] == 19 and f["height"] == 7 and f["channels"] == 3
        assert f["mean_value"] == 40 + (19 - 1) / 2.0

    def test_row_padding_excluded_from_mean(self):
        # width 1: stride pads 3 -> 4; pad bytes are zero and must not
        # leak into the per-pixel mean
        b = media.encode_bmp(1, 4, 200)
        assert media.decode_bmp(b)["mean_value"] == 200.0

    def test_bottom_up_row_order(self):
        # hand-build a top-heavy 1x2 image and check orientation via a
        # decoder variant: encode_bmp is a gradient across x only, so
        # instead flip manually — positive height means the FIRST stored
        # row is the BOTTOM image row
        b = bytearray(media.encode_bmp(1, 2, 10))
        # stored rows: [bottom, top]; make bottom=0, top=255
        off = int.from_bytes(b[10:14], "little")
        b[off : off + 3] = b"\x00\x00\x00"
        b[off + 4 : off + 7] = b"\xff\xff\xff"
        f = media.decode_bmp(bytes(b))
        assert f["mean_value"] == pytest.approx(127.5)

    def test_rejects_unsupported(self):
        b = bytearray(media.encode_bmp(4, 4, 0))
        b[28] = 8  # bpp
        with pytest.raises(ValueError):
            media.decode_bmp(bytes(b))

    def test_gradient_wrap_guard(self):
        with pytest.raises(ValueError):
            media.encode_bmp(64, 4, 250)


class TestPnm:
    def test_ppm_round_trip(self):
        b = media.encode_ppm(12, 9, 30)
        f = media.decode_ppm(b)
        assert (f["width"], f["height"], f["channels"]) == (12, 9, 3)
        assert f["mean_value"] == 30 + (9 - 1) / 2.0  # gradient across y

    def test_pgm_round_trip(self):
        b = media.encode_pgm(23, 8, 100)
        f = media.decode_pgm(b)
        assert (f["width"], f["height"], f["channels"]) == (23, 8, 1)
        assert f["mean_value"] == 100 + (23 - 1) / 2.0

    def test_header_comments_skipped(self):
        raw = b"P5\n# a comment\n  3 2\n# another\n255\n" + bytes(range(6))
        f = media.decode_pgm(raw)
        assert (f["width"], f["height"]) == (3, 2)
        assert f["mean_value"] == 2.5


class TestWav:
    def test_round_trip(self):
        b = media.encode_wav(301, 8000, 700)  # odd sample count
        f = media.decode_wav(b)
        assert f["sample_rate"] == 8000 and f["channels"] == 1
        assert f["rms"] == 700.0
        assert f["duration_ms"] == 301 * 1000.0 / 8000

    def test_chunk_walk_skips_unknown_chunks(self):
        b = media.encode_wav(16, 8000, 500)
        # splice a LIST chunk (odd size -> pad byte) between WAVE and fmt
        extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
        spliced = b[:12] + extra + b[12:]
        f = media.decode_wav(spliced)
        assert f["rms"] == 500.0

    def test_rejects_non_pcm(self):
        b = bytearray(media.encode_wav(8, 8000, 100))
        b[20] = 3  # IEEE float tag
        with pytest.raises(ValueError):
            media.decode_wav(bytes(b))


class TestPng:
    def test_roundtrip_gradient(self):
        b = media.encode_png(20, 9, 100)
        assert media.sniff_kind(b) == "png"
        d = media.decode_png(b)
        assert d == {
            "kind": "png",
            "width": 20,
            "height": 9,
            "channels": 3,
            "mean_value": 100 + 19 / 2,
        }

    def test_exactness_against_closed_form(self):
        for d in range(0, 64):
            png = media.encode_png(16 + d % 32, 8 + d % 16, (13 * d) % 200)
            got = media.decode_png(png)
            assert got["mean_value"] == ((13 * d) % 200) + (16 + d % 32 - 1) / 2.0
            assert (got["width"], got["height"], got["channels"]) == (
                16 + d % 32,
                8 + d % 16,
                3,
            )

    def test_average_and_paeth_filters(self):
        # hand-filter a grayscale image through all five filter types
        # and require the decoder to reconstruct the exact pixels
        import zlib

        w = 7
        rows = np.array(
            [
                [10, 20, 30, 40, 50, 60, 70],
                [13, 23, 33, 43, 53, 63, 73],
                [15, 26, 37, 48, 59, 70, 81],
                [200, 10, 250, 3, 90, 130, 255],
                [1, 255, 128, 0, 7, 99, 201],
            ],
            dtype=np.uint8,
        )
        filters = [0, 2, 3, 4, 1]  # None, Up, Average, Paeth, Sub
        lines = bytearray()
        prev = np.zeros(w, np.int64)
        for y, ft in enumerate(filters):
            r = rows[y].astype(np.int64)
            f = np.empty(w, np.int64)
            for x in range(w):
                a = r[x - 1] if x else 0
                c = prev[x - 1] if x else 0
                up = prev[x]
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = up
                elif ft == 3:
                    pred = (a + up) >> 1
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                f[x] = (r[x] - pred) % 256
            lines.append(ft)
            lines += f.astype(np.uint8).tobytes()
            prev = r
        ihdr = w.to_bytes(4, "big") + len(rows).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
        png = (
            media._PNG_SIG
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + media._png_chunk(b"IEND", b"")
        )
        d = media.decode_png(png)
        assert d["channels"] == 1
        assert d["mean_value"] == float(rows.astype(np.float64).mean())

    def test_crc_corruption_detected(self):
        b = bytearray(media.encode_png(12, 5, 30))
        b[50] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            media.decode_png(bytes(b))

    def test_rejects_unsupported_layouts(self):
        import zlib

        # 16-bit depth
        ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
        png = (
            media._PNG_SIG
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"IDAT", zlib.compress(b"\x00" * 36))
            + media._png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            media.decode_png(png)


class TestSniff:
    def test_kinds(self):
        assert media.sniff_kind(media.encode_bmp(4, 4, 0)) == "bmp"
        assert media.sniff_kind(media.encode_ppm(4, 4, 0)) == "ppm"
        assert media.sniff_kind(media.encode_pgm(4, 4, 0)) == "pgm"
        assert media.sniff_kind(media.encode_wav(4, 8000, 1)) == "wav"
        assert media.sniff_kind(b"\x89PNG\r\n") == "unknown"
        # baseline JPEG is a real codec now (functions/jpegx.py); a
        # truncated stream raises instead of degrading to "unknown"
        assert media.sniff_kind(b"\xff\xd8\xff jpeg") == "jpeg"
        with pytest.raises(ValueError):
            media.decode_media(b"\xff\xd8\xff jpeg")

    def test_exactness_against_numpy_oracle(self):
        # decoded statistics must be EXACT (the SQL oracle states them
        # as closed forms), not approximately equal
        for d in range(0, 64):
            bmp = media.encode_bmp(16 + d % 32, 16 + d % 24, d % 200)
            got = media.decode_bmp(bmp)["mean_value"]
            assert got == (d % 200) + (16 + d % 32 - 1) / 2.0
            wav = media.encode_wav(256 + d % 256, 8000, 100 * (1 + d % 100))
            assert media.decode_wav(wav)["rms"] == 100.0 * (1 + d % 100)


class TestLenientDecode:
    def test_corrupt_payloads_degrade_not_fail(self):
        import pyarrow as pa

        from link_profiler_repo_ray.functions import media
        from link_profiler_repo_ray.pipelines.textdata import MediaDecodeStage

        good = media.encode_bmp(8, 8, 10)
        bad_jpeg = b"\xff\xd8\xff truncated"
        bad_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 4
        batch = pa.table({"doc_id": [0, 1, 2], "payload": [good, bad_jpeg, bad_png]})
        out = MediaDecodeStage(lenient=True)(batch)
        kinds = out.column("kind").to_pylist()
        assert kinds[0] == "bmp" and kinds[1] == "corrupt" and kinds[2] == "corrupt"

    def test_strict_default_still_raises(self):
        import pyarrow as pa
        import pytest as _pytest

        from link_profiler_repo_ray.pipelines.textdata import MediaDecodeStage

        batch = pa.table({"doc_id": [0], "payload": [b"\xff\xd8\xff truncated"]})
        with _pytest.raises(ValueError):
            MediaDecodeStage()(batch)
