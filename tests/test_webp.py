"""WebP lossless (VP8L) codec tests: spec-pinned components (distance
map, prefix-value coding, bit order, a hand-built stream the encoder
never touched), encoder/decoder differential fuzz across the whole
feature matrix, closed-form synthesizer contract, the Spark/DuckDB
oracle gate, and the refuse-loudly error surface."""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pytest

from bm25spark.datapipe import webp as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def assert_matches(df, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    got = sorted(map(repr, (tuple(r) for r in df.collect())))
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want, f"{len(got)} vs {len(want)}: {got[:2]} | {want[:2]}"


class TestSpecComponents:
    def test_distance_map_pins(self):
        """The first 16 entries of the generated 2D distance map must
        equal the table the spec publishes (the generation rule is
        derived, so pin it against known values)."""
        assert W._DIST_MAP[:16] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3),
        ]
        assert len(W._DIST_MAP) == 120
        assert len(set(W._DIST_MAP)) == 120
        # full candidate set: dy 0..7, dx -7..8, dx>0 when dy=0
        assert set(W._DIST_MAP) == {
            (dx, dy)
            for dy in range(8)
            for dx in range(-7, 9)
            if dy > 0 or dx > 0
        }

    def test_prefix_value_roundtrip(self):
        for v in list(range(1, 400)) + [1024, 4095, 4096, 1048576]:
            code, ev, eb = W._prefix_value_encode(v, 40)
            bw = W._BitWriter()
            bw.put(ev, eb)
            br = W._BitReader(bytes(bw.bytes) or b"\x00")
            assert W._prefix_value_decode(br, code) == v

    def test_canonical_code_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            n = int(rng.integers(2, 60))
            freqs = [0] * n
            for s in rng.integers(0, n, size=int(rng.integers(2, 200))):
                freqs[int(s)] += 1
            lengths = W._huffman_lengths(freqs, max_len=15)
            if sum(1 for l in lengths if l) < 2:
                continue
            table = W._decode_table(lengths)
            codes = W._canonical_codes(lengths)
            for sym, (code, ln) in codes.items():
                bw = W._BitWriter()
                bw.put_code(code, ln)
                assert W._read_symbol(W._BitReader(bytes(bw.bytes)), table) == sym

    def test_hand_built_stream(self):
        """A VP8L stream assembled bit-by-bit in the TEST (the module's
        writer never touches it): 2x1 image, no transforms, no cache,
        no meta, all five codes simple single-symbol (zero data bits),
        so both pixels decode to the same fixed ARGB color."""
        bits = []

        def put(v, n):
            bits.extend((v >> i) & 1 for i in range(n))

        put(2 - 1, 14)  # width-1
        put(1 - 1, 14)  # height-1
        put(0, 1)       # alpha hint
        put(0, 3)       # version
        put(0, 1)       # no transforms
        put(0, 1)       # no color cache
        put(0, 1)       # no meta-prefix
        for sym in (66, 77, 88, 99, 0):  # green, red, blue, alpha, dist
            put(1, 1)   # simple
            put(0, 1)   # one symbol
            put(1, 1)   # 8-bit symbol
            put(sym, 8)
        payload = bytearray()
        for i, b in enumerate(bits):
            if i % 8 == 0:
                payload.append(0)
            payload[-1] |= b << (i % 8)
        payload = b"\x2f" + bytes(payload)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        px = W.decode_webp(data)
        assert px.shape == (1, 2, 4)
        # RGBA order: red=77, green=66, blue=88, alpha=99
        assert np.array_equal(px, np.full((1, 2, 4), [77, 66, 88, 99]))


class TestRoundtrip:
    def test_feature_matrix_fuzz(self):
        """Every encoder feature exercised against the decoder on
        random and low-entropy images — the GIF-LZW differential-fuzz
        move."""
        rng = np.random.default_rng(7)
        for trial in range(60):
            h, w = int(rng.integers(1, 18)), int(rng.integers(1, 18))
            if trial % 3 == 0:
                px = (rng.integers(0, 4, (h, w, 4)) * 60).astype(np.uint8)
            else:
                px = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            opts = dict(
                subtract_green=bool(rng.integers(0, 2)),
                predictor_bits=int(rng.choice([0, 0, 2, 3])),
                color_bits=int(rng.choice([0, 0, 2, 4])),
                cache_bits=int(rng.choice([0, 0, 1, 2, 5, 8])),
                lz77=bool(rng.integers(0, 2)),
                meta_bits=int(rng.choice([0, 0, 2, 3])),
                rng=rng,
            )
            out = W.decode_webp(W.encode_webp(px, **opts))
            assert np.array_equal(out, px), (trial, h, w, opts)

    def test_palette_bundling(self):
        """Color-indexing with every bundling width: 1-2 colors pack 8
        indices/byte, 3-4 pack 4, 5-16 pack 2, >16 unpacked."""
        rng = np.random.default_rng(11)
        for ncolors in (1, 2, 3, 4, 5, 16, 17, 130, 256):
            h, w = int(rng.integers(1, 12)), int(rng.integers(1, 20))
            colors = rng.integers(0, 256, (ncolors, 4)).astype(np.uint8)
            px = colors[rng.integers(0, ncolors, (h, w))]
            for cache_bits in (0, 3):
                data = W.encode_webp(
                    px, palette=True, cache_bits=cache_bits,
                    lz77=bool(rng.integers(0, 2)), rng=rng,
                )
                assert np.array_equal(W.decode_webp(data), px), ncolors

    def test_predictor_modes_exhaustive(self):
        """Each of the 14 predictor modes as the sole tile mode."""
        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, (9, 9, 4)).astype(np.uint8)
        argb = (
            (px[:, :, 3].astype(np.uint32) << 24)
            | (px[:, :, 0].astype(np.uint32) << 16)
            | (px[:, :, 1].astype(np.uint32) << 8)
            | px[:, :, 2]
        )
        for mode in range(14):
            modes = np.full((1, 1), mode, np.uint32)
            fwd = W._predictor_apply(argb, modes, 4, inverse=False)
            inv = W._predictor_apply(fwd, modes, 4, inverse=True)
            assert np.array_equal(inv, argb), mode

    def test_long_match_and_raw_distance(self):
        """A long repeated run (length > 4096 forces token splitting)
        and matches far enough back to need raw (>120) distances."""
        rng = np.random.default_rng(17)
        row = rng.integers(0, 256, (1, 300, 4)).astype(np.uint8)
        px = np.repeat(row, 20, axis=0)  # 6000-pixel matches, dist 300
        out = W.decode_webp(W.encode_webp(px, lz77=True))
        assert np.array_equal(out, px)

    def test_truncation_and_flips_raise_valueerror(self):
        fixture = W.synthesize_webp(6)
        ref = W.decode_webp(fixture)
        for cut in range(0, len(fixture), 5):
            try:
                W.decode_webp(fixture[:cut])
            except (ValueError, NotImplementedError):
                pass
        rng = np.random.default_rng(19)
        for _ in range(300):
            buf = bytearray(fixture)
            i = int(rng.integers(12, len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
            try:
                out = W.decode_webp(bytes(buf))
                assert out.ndim == 3  # silent wrong pixels are allowed
            except (ValueError, NotImplementedError):
                pass
        assert np.array_equal(W.decode_webp(fixture), ref)

    def test_single_symbol_normal_code_zero_bits(self):
        """Regression: a prefix code whose ONLY used symbol exceeds
        255 can't use the simple form — it goes through the normal
        (code-length-coded) path, where the spec's trivial-code
        convention reads ZERO bits per occurrence. The encoder must
        emit zero bits too, or every later token desyncs (found via a
        meta-prefix group whose only token was one color-cache hit)."""
        bw = W._BitWriter()
        lengths = [0] * 312
        lengths[310] = 1
        cmap = W._write_prefix_code(bw, lengths)
        assert cmap[310] == (0, 0)
        table = W._read_prefix_code(W._BitReader(bytes(bw.bytes)), 312)
        assert table == ("single", 310)
        # end-to-end shape that originally hit it: meta groups + cache
        # where one group's sole token is a cache reference
        rng = np.random.default_rng(524)
        px = W._webp_pixels(524, 13, 10)
        data = W.encode_webp(
            px, meta_bits=2, lz77=True, cache_bits=5,
            subtract_green=True, predictor_bits=3, rng=rng,
        )
        assert np.array_equal(W.decode_webp(data), px)

    def test_lossy_webp_refused(self):
        payload = b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError, match="VP8L lossless"):
            W.decode_webp(data)

    def test_simple_code_canonical_order(self):
        """The simple form only transmits WHICH symbols have length 1;
        codes are assigned canonically, so bit 0 must select the
        numerically SMALLER symbol even when the stream lists the
        larger one first (the in-repo encoder always writes ascending,
        so only a hand-built stream can pin this)."""
        bits = []

        def put(v, n):
            bits.extend((v >> i) & 1 for i in range(n))

        put(2 - 1, 14)  # width-1
        put(1 - 1, 14)  # height-1
        put(0, 1)       # alpha hint
        put(0, 3)       # version
        put(0, 1)       # no transforms
        put(0, 1)       # no color cache
        put(0, 1)       # no meta-prefix
        # green: simple TWO-symbol code transmitted DESCENDING (200, 100)
        put(1, 1)   # simple
        put(1, 1)   # two symbols
        put(1, 1)   # 8-bit first symbol
        put(200, 8)
        put(100, 8)
        for sym in (10, 20, 255, 0):  # red, blue, alpha, dist: single
            put(1, 1)
            put(0, 1)
            put(1, 1)
            put(sym, 8)
        # data: pixel0 green bit 0 -> canonical smaller symbol (100),
        # pixel1 green bit 1 -> larger symbol (200)
        put(0, 1)
        put(1, 1)
        payload = bytearray()
        for i, b in enumerate(bits):
            if i % 8 == 0:
                payload.append(0)
            payload[-1] |= b << (i % 8)
        payload = b"\x2f" + bytes(payload)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        px = W.decode_webp(data)
        assert px[0, 0].tolist() == [10, 100, 20, 255]
        assert px[0, 1].tolist() == [10, 200, 20, 255]

    def test_vp8x_wrapped_lossless_decodes(self):
        """A lossless file saved with metadata wraps the identical
        VP8L chunk in a VP8X extended container — the walk must skip
        VP8X/EXIF and still decode it."""
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (5, 4, 4)).astype(np.uint8)
        plain = W.encode_webp(px)
        vp8l_chunk = plain[12:]
        w, h = 4, 5
        vp8x_body = struct.pack(
            "<B3B", 0x08, 0, 0, 0
        ) + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        vp8x = b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body
        exif_body = b"Exif\x00\x00odd"  # odd length -> pad byte
        exif = b"EXIF" + struct.pack("<I", len(exif_body)) + exif_body
        if len(exif_body) & 1:
            exif += b"\x00"
        inner = vp8x + exif + vp8l_chunk
        data = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner
        assert np.array_equal(W.decode_webp(data), px)

    def test_animated_webp_refused(self):
        body = b"\x00" * 6
        anim = b"ANIM" + struct.pack("<I", len(body)) + body
        data = b"RIFF" + struct.pack("<I", 4 + len(anim)) + b"WEBP" + anim
        with pytest.raises(NotImplementedError, match="animated"):
            W.decode_webp(data)

    def test_encoder_rejects_out_of_range_bits(self):
        px = np.zeros((4, 4, 4), np.uint8)
        for kw in (
            {"predictor_bits": 1},
            {"predictor_bits": 10},
            {"color_bits": 1},
            {"meta_bits": 10},
            {"cache_bits": 12},
        ):
            with pytest.raises(ValueError, match="must be"):
                W.encode_webp(px, **kw)


class TestSynthesizer:
    def test_closed_form_all_variants(self):
        """Every doc decodes to the closed-form pixels regardless of
        which encoder feature set its variant used (lossless)."""
        for d in range(35):  # 5 full cycles of the 7 variants
            px = W.decode_webp(W.synthesize_webp(d))
            w, h = W.webp_dims(d)
            assert px.shape == (h, w, 4)
            assert np.array_equal(px, W._webp_pixels(d, w, h)), d

    def test_variants_actually_differ(self):
        """The rotation is real: consecutive variants produce distinct
        header feature bits (guard against the rotation collapsing)."""
        blobs = [W.synthesize_webp(d) for d in range(7)]
        assert len({b[:40] for b in blobs}) == 7

    def test_dispatch_via_decode_image(self):
        from bm25spark.datapipe import multimodal as M

        px = M.decode_image(W.synthesize_webp(3))
        w, h = W.webp_dims(3)
        assert px.shape == (h, w, 4)

    def test_spark_features_match_oracle(self, spark, docs):
        assert_matches(
            W.webp_features(W.synthesize_webp_media(docs)).orderBy("doc_id"),
            W.image_webp_features_sql(),
        )
