"""Multimodal tests (G62): schema round-trip through parquet, Arrow
batch shapes in mapInPandas, metadata-only planning ops, stub decode
determinism — plus the REAL pure-stdlib codecs (PNG chunk walk / five
scanline filters / CRC, PCM-16 WAV), the ``kernel="codec"`` feature
path on planted real bytes, and the plan-then-execute resize."""

from __future__ import annotations

import shutil
import struct
import tempfile
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import media_codecs as mc
from kafka_cassandra_plugin_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return M.synth_media_table(docs)


class TestSchema:
    def test_media_schema_shape(self, media):
        assert [f.name for f in media.schema.fields] == [
            "media_id", "kind", "payload", "meta",
        ]
        assert media.schema["payload"].dataType.typeName() == "binary"
        assert media.schema["meta"].dataType.typeName() == "struct"

    def test_parquet_roundtrip(self, spark, media):
        d = tempfile.mkdtemp(prefix="kcp_media_")
        try:
            media.write.mode("overwrite").parquet(f"{d}/media")
            back = spark.read.parquet(f"{d}/media")
            # parquet round-trip relaxes nullability; compare names+types
            assert back.schema.simpleString() == media.schema.simpleString()
            assert back.count() == media.count()
            a = media.select("media_id", F.md5(F.col("payload")).alias("h"))
            b = back.select("media_id", F.md5(F.col("payload")).alias("h"))
            assert a.exceptAll(b).count() == 0
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestDecode:
    def test_features_deterministic_and_total(self, media):
        out = M.decode_features(media)
        assert out.count() == media.count()
        row = out.orderBy("media_id").first()
        again = M.decode_features(media).orderBy("media_id").first()
        assert row.features == again.features
        assert len(row.features) == M.FEATURE_DIM

    def test_arrow_batching_bounded(self, spark, media):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        try:
            out = M.decode_features(media)
            max_batch = out.agg(F.max("_batch_rows")).collect()[0][0]
            assert max_batch <= 64  # memory stays bounded by batch size
        finally:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


class TestMetadataPlans:
    def test_resize_plan_is_metadata_only(self, media):
        plan = M.resize_plan(media, 224, 224)
        rows = plan.collect()
        assert all(r.dst_w <= 224 and r.dst_h <= 224 for r in rows)
        for r in rows:
            if r.needs_resize:
                assert r.dst_w < r.src_w or r.dst_h < r.src_h

    def test_frame_sample_counts(self, media):
        frames = M.frame_sample_plan(media, every_ms=1000)
        joined = (
            frames.groupBy("media_id")
            .count()
            .join(
                media.filter(F.col("kind") == "video").select(
                    "media_id", F.col("meta.duration_ms").alias("dur")
                ),
                "media_id",
            )
        )
        bad = joined.filter(
            F.col("count") != (F.floor((F.col("dur") - 1) / 1000) + 1)
        )
        assert bad.count() == 0

    def test_audio_windows(self, media):
        w = M.audio_window_plan(media, window_ms=500)
        assert w.filter(F.col("n_samples") != 8000).count() == 0  # 16kHz * 0.5s


# --------------------------------------------------------------------------
# Real codecs (pure stdlib) — spec-level tests, no Spark needed
# --------------------------------------------------------------------------

def _spec_filter(ftype: int, recon: bytes, prev: bytes, bpp: int) -> bytes:
    """Independent re-derivation of PNG scanline filtering (RFC 2083
    §6): given the RECONSTRUCTED bytes, produce the FILTERED bytes the
    encoder would write — so the decoder under test must invert it."""
    out = bytearray()
    for x in range(len(recon)):
        left = recon[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = recon[x]
        elif ftype == 1:
            v = recon[x] - left
        elif ftype == 2:
            v = recon[x] - up
        elif ftype == 3:
            v = recon[x] - (left + up) // 2
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (
                up if pb <= pc else ul)
            v = recon[x] - pred
        out.append(v & 0xFF)
    return bytes(out)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _build_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Hand-assemble a PNG whose scanlines use the given filter types,
    with the filtered bytes computed by the independent spec function
    above."""
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    prev = bytes(w * c)
    for y, f in zip(range(h), filters):
        recon = pixels[y].tobytes()
        raw.append(f)
        raw += _spec_filter(f, recon, prev, c)
        prev = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (mc.PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


class TestPngCodec:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip(self, channels):
        rng = np.random.RandomState(7 + channels)
        px = rng.randint(0, 256, size=(13, 9, channels), dtype=np.uint8)
        back = mc.decode_png(mc.encode_png(px))
        assert back.shape == px.shape
        assert np.array_equal(back, px)

    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_all_five_filters_defilter_correctly(self, channels):
        """The decoder must invert Sub/Up/Average/Paeth, not just the
        filter-0 lines our encoder writes — fixtures are built from an
        independent spec-derived filter implementation."""
        rng = np.random.RandomState(channels)
        px = rng.randint(0, 256, size=(5, 7, channels), dtype=np.uint8)
        data = _build_png(px, filters=[0, 1, 2, 3, 4])
        assert np.array_equal(mc.decode_png(data), px)

    def test_crc_corruption_detected(self):
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        data = bytearray(mc.encode_png(px))
        # flip one byte inside the IDAT payload
        idat_at = bytes(data).index(b"IDAT") + 6
        data[idat_at] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            mc.decode_png(bytes(data))

    def test_not_a_png_and_truncation(self):
        with pytest.raises(ValueError, match="signature"):
            mc.decode_png(b"\x00" * 16)
        good = mc.encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            mc.decode_png(good[: len(good) // 2])

    def test_malformed_streams_rejected(self):
        """An IHDR that promises a layout the IDAT bytes don't carry
        must fail loudly (these were NotImplementedError declines
        before round 12 closed the format gaps)."""
        px = np.zeros((2, 2, 3), dtype=np.uint8)
        base = mc.encode_png(px)

        def rebuild_ihdr(depth, interlace):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace)
            at = base.index(b"IHDR") - 4
            end = at + 12 + 13
            return base[:at] + _chunk(b"IHDR", ihdr) + base[end:]

        with pytest.raises(ValueError):  # Adam7 layout, flat-stream bytes
            mc.decode_png(rebuild_ihdr(8, 1))
        with pytest.raises(ValueError):  # 16-bit layout, 8-bit payload
            mc.decode_png(rebuild_ihdr(16, 0))
        with pytest.raises(ValueError, match="interlace"):
            mc.decode_png(rebuild_ihdr(8, 2))
        with pytest.raises(ValueError, match="illegal"):
            mc.decode_png(rebuild_ihdr(4, 0))  # RGB at depth 4

    def test_sniff(self):
        png = mc.encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
        wav = mc.encode_wav(np.zeros(8, dtype=np.int16), 8000)
        assert mc.sniff_kind(png) == "png"
        assert mc.sniff_kind(wav) == "wav"
        assert mc.sniff_kind(b"garbage!") is None
        assert mc.sniff_kind(None) is None


# Adam7 pass lattice typed straight from RFC 2083 §2.6 (independently
# of the decoder's table) so the fixtures are spec-derived
_ADAM7_SPEC = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _build_adam7_png(pixels: np.ndarray, depth: int = 8) -> bytes:
    """Hand-assemble an Adam7-interlaced PNG (filter 0 on every pass
    row): each pass extracts its (start, step) lattice sub-image and
    is emitted as an independently filtered stream, per the spec."""
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    for xs, ys, xstep, ystep in _ADAM7_SPEC:
        sub = pixels[ys::ystep, xs::xstep]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += (sub[y].astype(">u2").tobytes() if depth == 16
                    else sub[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    return (mc.PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _pack_bits_row(vals, depth: int) -> bytes:
    """Pack sub-byte samples MSB-first with zero row padding (RFC 2083
    §2.3) — independent of the decoder's unpack."""
    bits = []
    for v in vals:
        bits.extend((int(v) >> i) & 1 for i in range(depth - 1, -1, -1))
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - i) for i, b in enumerate(bits[k:k + 8]))
        for k in range(0, len(bits), 8)
    )


def _build_subbyte_png(indices: np.ndarray, depth: int, color: int,
                       plte: bytes | None = None,
                       trns: bytes | None = None) -> bytes:
    """Grey (color 0) or palette (color 3) PNG at depth 1/2/4/8 with
    filter-0 rows; optional PLTE/tRNS chunks in spec order."""
    h, w = indices.shape
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += (_pack_bits_row(indices[y], depth) if depth < 8
                else bytes(int(v) for v in indices[y]))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = mc.PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return (out + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


class TestPng16Bit:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip(self, channels):
        rng = np.random.RandomState(16 + channels)
        px = rng.randint(0, 65536, size=(6, 5, channels), dtype=np.uint16)
        back = mc.decode_png(mc.encode_png(px))
        assert back.dtype == np.uint16
        assert np.array_equal(back, px)

    def test_sub_filter_hand_computed(self):
        """Grey-16 row [256, 257] under the Sub filter: filtering is
        BYTE-wise with the left neighbor bpp=2 back, so the filtered
        bytes are 01 00 (left=0) then 01-01=00, 01-00=01."""
        raw = b"\x01" + bytes([0x01, 0x00, 0x00, 0x01])
        ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
        data = (mc.PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(raw))
                + _chunk(b"IEND", b""))
        assert np.array_equal(mc.decode_png(data),
                              np.array([[[256], [257]]], dtype=np.uint16))

    def test_all_five_filters_rgb16(self):
        """Spec-derived filtered fixtures at bpp = 3 channels x 2
        bytes: the decoder must defilter on BYTES before assembling
        big-endian sample pairs."""
        rng = np.random.RandomState(61)
        px = rng.randint(0, 65536, size=(5, 4, 3), dtype=np.uint16)
        h, w, c = px.shape
        raw = bytearray()
        prev = bytes(w * c * 2)
        for y, f in zip(range(h), [0, 1, 2, 3, 4]):
            recon = px[y].astype(">u2").tobytes()
            raw.append(f)
            raw += _spec_filter(f, recon, prev, c * 2)
            prev = recon
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
        data = (mc.PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(mc.decode_png(data), px)

    def test_colorkey_trns_grey16(self):
        px = np.array([[[7], [65535]], [[7], [0]]], dtype=np.uint16)
        base = mc.encode_png(px)
        # splice a tRNS chunk (key = 7) between IHDR and IDAT
        at = base.index(b"IDAT") - 4
        data = base[:at] + _chunk(b"tRNS", struct.pack(">H", 7)) + base[at:]
        out = mc.decode_png(data)
        assert out.dtype == np.uint16 and out.shape == (2, 2, 2)
        assert np.array_equal(out[:, :, 0], px[:, :, 0])
        assert np.array_equal(out[:, :, 1],
                              [[0, 65535], [0, 65535]])

    def test_resize_preserves_uint16(self):
        px = np.full((8, 8, 3), 60000, dtype=np.uint16)
        for method in ("nearest", "area"):
            out = mc.resize_image(px, 4, 4, method=method)
            assert out.dtype == np.uint16
            assert np.array_equal(out, np.full((4, 4, 3), 60000,
                                               dtype=np.uint16))

    def test_features_normalized_by_dtype_max(self):
        """A constant half-scale image must yield the same mean
        feature at 8 and 16 bits — the kernel divides by the dtype
        max, not a hardwired 255."""
        px8 = np.full((4, 4, 3), 128, dtype=np.uint8)
        px16 = np.full((4, 4, 3), 32896, dtype=np.uint16)  # 128*257
        f8 = M._codec_features(mc.encode_png(px8))
        f16 = M._codec_features(mc.encode_png(px16))
        assert f8 is not None and f16 is not None
        assert abs(f8[0] - 128 / 255) < 1e-12
        assert abs(f16[0] - f8[0]) < 1e-12


class TestPngPalette:
    def test_palette_8bit_lookup(self):
        plte = bytes([10, 20, 30, 40, 50, 60, 200, 0, 100])
        idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
        out = mc.decode_png(_build_subbyte_png(idx, 8, 3, plte=plte))
        expect = np.array(
            [[[10, 20, 30], [40, 50, 60]],
             [[200, 0, 100], [40, 50, 60]]], dtype=np.uint8)
        assert np.array_equal(out, expect)

    def test_palette_2bit_with_trns_alpha(self):
        plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])
        idx = np.array([[0, 1, 2, 3, 1]], dtype=np.uint8)
        data = _build_subbyte_png(idx, 2, 3, plte=plte,
                                  trns=bytes([255, 128]))
        out = mc.decode_png(data)
        assert out.shape == (1, 5, 4)
        assert np.array_equal(
            out[0, :, 3], [255, 128, 255, 255, 128])  # short tRNS -> 255
        assert np.array_equal(out[0, 2, :3], [0, 0, 255])

    def test_palette_1bit_and_4bit(self):
        plte = bytes(range(48))  # 16 entries
        idx4 = np.array([[0, 15, 7, 8, 1]], dtype=np.uint8)
        out4 = mc.decode_png(_build_subbyte_png(idx4, 4, 3, plte=plte))
        assert np.array_equal(out4[0, 1], [45, 46, 47])
        idx1 = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1]], dtype=np.uint8)
        out1 = mc.decode_png(_build_subbyte_png(idx1, 1, 3,
                                                plte=plte[:6]))
        assert np.array_equal(out1[0, :, 0], idx1[0] * 3)

    def test_missing_plte_and_bad_index(self):
        idx = np.array([[0, 3]], dtype=np.uint8)
        with pytest.raises(ValueError, match="PLTE"):
            mc.decode_png(_build_subbyte_png(idx, 8, 3, plte=None))
        with pytest.raises(ValueError, match="out of range"):
            mc.decode_png(_build_subbyte_png(idx, 8, 3,
                                             plte=bytes(9)))  # 3 entries


class TestPngSubByteGrey:
    def test_1bit_scaled_to_full_range(self):
        g = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 0]], dtype=np.uint8)
        out = mc.decode_png(_build_subbyte_png(g, 1, 0))
        assert out.shape == (1, 10, 1)
        assert np.array_equal(out[0, :, 0], g[0] * 255)

    def test_2bit_and_4bit_scaling(self):
        g2 = np.array([[0, 1, 2, 3]], dtype=np.uint8)
        out2 = mc.decode_png(_build_subbyte_png(g2, 2, 0))
        assert np.array_equal(out2[0, :, 0], [0, 85, 170, 255])
        g4 = np.array([[0, 5, 15], [7, 8, 1]], dtype=np.uint8)
        out4 = mc.decode_png(_build_subbyte_png(g4, 4, 0))
        assert np.array_equal(out4[:, :, 0], g4 * 17)

    def test_colorkey_trns_subbyte_uses_native_key(self):
        """The tRNS key compares against the NATIVE 2-bit sample (2),
        not the scaled 8-bit value (170)."""
        g = np.array([[0, 2, 3, 2]], dtype=np.uint8)
        data = _build_subbyte_png(g, 2, 0, trns=struct.pack(">H", 2))
        out = mc.decode_png(data)
        assert out.shape == (1, 4, 2)
        assert np.array_equal(out[0, :, 0], [0, 170, 255, 170])
        assert np.array_equal(out[0, :, 1], [255, 0, 255, 0])

    def test_colorkey_trns_rgb8(self):
        px = np.array([[[1, 2, 3], [9, 9, 9]]], dtype=np.uint8)
        base = mc.encode_png(px)
        at = base.index(b"IDAT") - 4
        data = (base[:at]
                + _chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
                + base[at:])
        out = mc.decode_png(data)
        assert out.shape == (1, 2, 4)
        assert np.array_equal(out[0, :, 3], [0, 255])

    @pytest.mark.parametrize("channels", [2, 4])
    def test_trns_prohibited_with_alpha_color_types(self, channels):
        """RFC 2083 §4.2.1 prohibits tRNS on grey-alpha (4) and RGBA
        (6); the codec fails loudly instead of silently ignoring it."""
        px = np.full((1, 2, channels), 9, dtype=np.uint8)
        base = mc.encode_png(px)
        at = base.index(b"IDAT") - 4
        data = (base[:at] + _chunk(b"tRNS", struct.pack(">H", 9))
                + base[at:])
        with pytest.raises(ValueError, match="tRNS.*not allowed"):
            mc.decode_png(data)


class TestPngAdam7:
    def test_canonical_pass_map(self):
        """The textbook 8x8 Adam7 grid: every pixel of pass p carries
        value p, so the decoded image IS the spec's pass-number
        diagram (RFC 2083 §2.6)."""
        expect = np.array([
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7]], dtype=np.uint8)[:, :, None]
        out = mc.decode_png(_build_adam7_png(expect))
        assert np.array_equal(out, expect)

    @pytest.mark.parametrize("shape", [(13, 9, 3), (5, 3, 1), (3, 5, 4),
                                       (1, 1, 3), (2, 2, 2)])
    def test_random_content_odd_dims(self, shape):
        """Non-multiple-of-8 dims exercise partial and EMPTY passes
        (e.g. height 3 has no pass-3 rows)."""
        rng = np.random.RandomState(sum(shape))
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(mc.decode_png(_build_adam7_png(px)), px)

    def test_adam7_16bit(self):
        rng = np.random.RandomState(77)
        px = rng.randint(0, 65536, size=(5, 6, 3), dtype=np.uint16)
        out = mc.decode_png(_build_adam7_png(px, depth=16))
        assert out.dtype == np.uint16
        assert np.array_equal(out, px)

    def test_trailing_bytes_rejected(self):
        """A junk byte after the last pass must fail loudly, not be
        silently ignored (it means the pass accounting is wrong)."""
        px = np.zeros((4, 4, 1), dtype=np.uint8)
        raw = bytearray()
        for xs, ys, xstep, ystep in _ADAM7_SPEC:
            sub = px[ys::ystep, xs::xstep]
            if sub.size == 0:
                continue
            for y in range(sub.shape[0]):
                raw.append(0)
                raw += sub[y].tobytes()
        raw.append(0)  # the junk byte
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
        data = (mc.PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="consumed"):
            mc.decode_png(data)


class TestWavCodec:
    def test_roundtrip_against_stdlib(self, tmp_path):
        """encode_wav output must be readable by the stdlib wave module
        directly, and decode_wav must invert a stdlib-written file —
        both directions independent of our own pairing."""
        import io
        import wave as stdwave

        rng = np.random.RandomState(3)
        s = rng.randint(-30000, 30000, size=(500, 2)).astype(np.int16)
        blob = mc.encode_wav(s, 44100)
        with stdwave.open(io.BytesIO(blob), "rb") as wf:
            assert wf.getframerate() == 44100
            assert wf.getnchannels() == 2
            raw = wf.readframes(wf.getnframes())
        assert np.array_equal(
            np.frombuffer(raw, dtype="<i2").reshape(-1, 2), s)
        # stdlib-written -> our decoder
        buf = io.BytesIO()
        with stdwave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(s[:, 0].tobytes())
        rate, back = mc.decode_wav(buf.getvalue())
        assert rate == 8000
        assert np.array_equal(back[:, 0], s[:, 0])

    def test_non_pcm16_declines(self):
        import io
        import wave as stdwave

        buf = io.BytesIO()
        with stdwave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)  # 8-bit
            wf.setframerate(8000)
            wf.writeframes(b"\x80" * 100)
        with pytest.raises(NotImplementedError, match="PCM-16"):
            mc.decode_wav(buf.getvalue())


class TestResizeImage:
    def test_nearest_integer_downscale(self):
        # 4x4 checkerboard of 2x2 blocks -> 2x2 picks block centers
        px = np.zeros((4, 4, 1), dtype=np.uint8)
        px[:2, 2:] = 100
        px[2:, :2] = 200
        px[2:, 2:] = 50
        out = mc.resize_image(px, 2, 2, method="nearest")
        assert out[:, :, 0].tolist() == [[0, 100], [200, 50]]

    def test_area_is_exact_box_mean(self):
        rng = np.random.RandomState(11)
        px = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
        out = mc.resize_image(px, 4, 3, method="area")
        want = np.round(
            px.astype(float).reshape(3, 2, 4, 2, 3).mean(axis=(1, 3))
        ).astype(np.uint8)
        assert np.array_equal(out, want)

    def test_constant_stays_constant_any_ratio(self):
        px = np.full((7, 5, 3), 137, dtype=np.uint8)
        for method in ("area", "nearest"):
            out = mc.resize_image(px, 3, 4, method=method)
            assert out.shape == (4, 3, 3)
            assert np.all(out == 137)

    def test_bad_args(self):
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="dims"):
            mc.resize_image(px, 0, 2)
        with pytest.raises(ValueError, match="method"):
            mc.resize_image(px, 2, 2, method="bicubic")


# --------------------------------------------------------------------------
# The real kernel through Spark: planted real bytes end to end
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def codec_media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents.limit(200)
    return M.synth_codec_media_table(docs).localCheckpoint()


class TestCodecKernel:
    def test_real_decode_total_and_deterministic(self, codec_media):
        out = M.decode_features(codec_media, kernel="codec",
                                batch_note_col=None)
        rows = {r.media_id: r.features for r in out.collect()}
        assert len(rows) == codec_media.count()
        assert all(f is not None and len(f) == M.FEATURE_DIM
                   for f in rows.values())
        again = {
            r.media_id: r.features
            for r in M.decode_features(
                codec_media.repartition(7), kernel="codec",
                batch_note_col=None).collect()
        }
        assert rows == again

    def test_image_features_match_hand_arithmetic(self, spark):
        """Plant ONE known image; re-derive every feature slot with
        independent numpy arithmetic."""
        rng = np.random.RandomState(99)
        px = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
        media = spark.createDataFrame(
            [(1, bytearray(mc.encode_png(px)))],
            "media_id long, payload binary",
        )
        (row,) = M.decode_features(media, kernel="codec",
                                   batch_note_col=None).collect()
        f = px.reshape(-1, 3) / 255.0
        luma = f @ np.array([0.299, 0.587, 0.114])
        hist = np.histogram(luma, bins=8, range=(0.0, 1.0))[0] / luma.size
        want = [*f.mean(axis=0), *f.std(axis=0), *hist,
                np.log1p(6) / 10.0, np.log1p(10) / 10.0]
        assert row.features == pytest.approx(want, abs=1e-12)

    def test_audio_features_match_hand_arithmetic(self, spark):
        s = (np.sin(np.arange(400) / 5.0) * 20000).astype(np.int16)
        media = spark.createDataFrame(
            [(2, bytearray(mc.encode_wav(s, 16000)))],
            "media_id long, payload binary",
        )
        (row,) = M.decode_features(media, kernel="codec",
                                   batch_note_col=None).collect()
        x = s.astype(float) / 32768.0
        zc = np.count_nonzero(np.diff(np.signbit(x))) / x.size
        hist = np.histogram(np.abs(x), bins=8, range=(0.0, 1.0))[0] / x.size
        want = [x.mean(), x.std(), np.sqrt((x * x).mean()), zc,
                np.abs(x).max(), *hist,
                np.log1p(16000) / 20.0, np.log1p(400) / 20.0, 1 / 8.0]
        assert row.features == pytest.approx(want, abs=1e-12)

    def test_on_error_policies(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"not media at all"))],
            "media_id long, payload binary",
        )
        (row,) = M.decode_features(media, kernel="codec", on_error="null",
                                   batch_note_col=None).collect()
        assert row.features is None
        from py4j.protocol import Py4JJavaError
        with pytest.raises((Py4JJavaError, Exception)):
            M.decode_features(media, kernel="codec", on_error="raise",
                              batch_note_col=None).collect()
        with pytest.raises(ValueError, match="kernel"):
            M.decode_features(media, kernel="pillow")

    def test_stub_kernel_unchanged(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"abc"))], "media_id long, payload binary")
        (row,) = M.decode_features(media, batch_note_col=None).collect()
        assert row.features == M._stub_features(b"abc")


class TestResizeImagesExecute:
    MAXD = 24

    @pytest.fixture(scope="class")
    def resized(self, codec_media):
        return M.resize_images(codec_media, self.MAXD, self.MAXD).cache()

    def test_dims_capped_and_match_plan(self, codec_media, resized):
        plan = {r.media_id: r for r in M.resize_plan(
            codec_media, self.MAXD, self.MAXD).collect()}
        rows = resized.collect()
        assert len(rows) == len(plan)  # every image, no audio rows
        for r in rows:
            assert r.width <= self.MAXD and r.height <= self.MAXD
            assert (r.width, r.height) == (
                plan[r.media_id].dst_w, plan[r.media_id].dst_h)
            assert r.resized == plan[r.media_id].needs_resize

    def test_resized_payloads_decode_to_target_dims(self, resized):
        for r in resized.filter("resized").limit(10).collect():
            px = mc.decode_png(bytes(r.payload))
            assert px.shape[:2] == (r.height, r.width)

    def test_small_images_pass_through_byte_identical(self, codec_media,
                                                      resized):
        src = {r.media_id: bytes(r.payload)
               for r in codec_media.filter("kind = 'image'").collect()}
        passthrough = resized.filter("NOT resized").collect()
        assert passthrough  # synth table plants sub-24px images
        for r in passthrough:
            assert bytes(r.payload) == src[r.media_id]

    def test_aspect_ratio_preserved(self, resized):
        for r in resized.filter("resized").collect():
            px_ratio = r.width / r.height
            src = mc.decode_png(bytes(r.payload))
            # decoded output matches the recorded dims; ratio close to
            # the plan's uniform-scale contract is covered by the plan
            # test — here just sanity the payload agrees with columns
            assert src.shape[1] / src.shape[0] == pytest.approx(
                px_ratio, rel=0.01)
