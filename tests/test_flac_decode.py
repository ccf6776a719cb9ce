"""FLAC full sample decode (round 6) — from-spec Rice + FIXED
prediction + CRC verification. The oracle layer pins the e2e path at
sf0.01 (catalog: media_flac_samples); these tests cover the decoder's
GENERAL envelope beyond what the synthesis recipe emits: higher fixed
orders, nonzero partition orders, the 5-bit Rice method, and checksum
rejection."""

from __future__ import annotations

from pasta_pipeline_spark.operators.multimodal import (
    _BitW,
    _flac_crc8,
    _flac_crc16,
    _flac_sample,
    _synth_flac_full,
    decode_flac_samples,
)


def _encode_general(samples, order, porder, k, kbits=4):
    """Test-local general FLAC encoder: FIXED order 0-4, any partition
    order, 4- or 5-bit Rice method — the shapes _synth_flac_full never
    emits, so the decoder's general path is exercised independently."""
    n = len(samples)
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | n
    streaminfo = (
        n.to_bytes(2, "big") * 2
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + bytes(16)
    )
    header = bytearray([0xFF, 0xF8, 0x64, 0x08, 0x00, n - 1])
    header.append(_flac_crc8(bytes(header)))
    w = _BitW()
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for s in samples[:order]:
        w.write(s & 0xFFFF, 16)
    w.write(0 if kbits == 4 else 1, 2)
    w.write(porder, 4)
    coeffs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    idx = order
    nparts = 1 << porder
    for p in range(nparts):
        w.write(k, kbits)
        count = n // nparts - (order if p == 0 else 0)
        for _ in range(count):
            pred = sum(c * samples[idx - j - 1] for j, c in enumerate(coeffs))
            r = samples[idx] - pred
            idx += 1
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            q, rem = u >> k, u & ((1 << k) - 1)
            for _ in range(q):
                w.write(0, 1)
            w.write(1, 1)
            if k:
                w.write(rem, k)
    w.pad()
    frame = bytes(header) + w.bytes()
    frame += _flac_crc16(frame).to_bytes(2, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo + frame


class TestFlacDecode:
    def test_synthesis_round_trip_all_variants(self):
        for mid in range(15):
            out = decode_flac_samples(_synth_flac_full(mid))
            n = 32 + (mid % 5) * 8
            if mid % 3 == 0:
                c = (mid % 3001) - 1500
                assert out == {
                    "n_samples": n, "sample_rate": 8000,
                    "sample_sum": n * c, "sample_min": c, "sample_max": c,
                }
            else:
                s = [_flac_sample(mid, i) for i in range(n)]
                assert out == {
                    "n_samples": n, "sample_rate": 8000,
                    "sample_sum": sum(s), "sample_min": min(s),
                    "sample_max": max(s),
                }

    def test_fixed_order2_partitioned_5bit_rice(self):
        # a gently curving series keeps order-2 residuals small
        samples = [100 + 3 * i + (i * i) % 7 for i in range(64)]
        raw = _encode_general(samples, order=2, porder=1, k=6, kbits=5)
        out = decode_flac_samples(raw)
        assert out is not None
        assert out["n_samples"] == 64
        assert out["sample_sum"] == sum(samples)
        assert out["sample_min"] == min(samples)
        assert out["sample_max"] == max(samples)

    def test_fixed_order4_and_zero_k(self):
        samples = [50] * 32  # constant series: order-4 residuals all 0
        raw = _encode_general(samples, order=4, porder=0, k=0)
        out = decode_flac_samples(raw)
        assert out is not None and out["sample_sum"] == 50 * 32

    def test_crc8_and_crc16_rejection(self):
        raw = bytearray(_synth_flac_full(7))
        good = decode_flac_samples(bytes(raw))
        assert good is not None
        # corrupt the frame-header CRC byte
        bad8 = bytearray(raw)
        bad8[4 + 4 + 34 + 6] ^= 0xFF
        assert decode_flac_samples(bytes(bad8)) is None
        # corrupt a payload byte (CRC-16 catches it)
        bad16 = bytearray(raw)
        bad16[-5] ^= 0x01
        assert decode_flac_samples(bytes(bad16)) is None

    def test_non_flac_and_truncated(self):
        assert decode_flac_samples(b"not a flac") is None
        raw = _synth_flac_full(3)
        assert decode_flac_samples(raw[: len(raw) // 2]) is None

    def test_spark_e2e_matches_closed_form(self, spark):
        from pasta_pipeline_spark.operators.multimodal import (
            decode_audio_samples,
            synthesize_media,
        )
        import pyspark.sql.functions as F

        ids = spark.range(12).select(F.col("id").alias("media_id"))
        media = synthesize_media(ids, variant="flac_full")
        rows = {r["media_id"]: r for r in decode_audio_samples(media).collect()}
        assert len(rows) == 12
        for mid in range(12):
            exp = decode_flac_samples(_synth_flac_full(mid))
            got = rows[mid]
            assert got["sample_sum"] == exp["sample_sum"]
            assert got["n_samples"] == exp["n_samples"]


def _frame_wrap(n, byte3, body_bits_writer):
    """Test-local: wrap subframe bits in a valid stream with header
    CRCs; byte3 selects channel assignment / bps."""
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | n
    streaminfo = (
        n.to_bytes(2, "big") * 2
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + bytes(16)
    )
    header = bytearray([0xFF, 0xF8, 0x64, byte3, 0x00, n - 1])
    header.append(_flac_crc8(bytes(header)))
    w = _BitW()
    body_bits_writer(w)
    w.pad()
    frame = bytes(header) + w.bytes()
    frame += _flac_crc16(frame).to_bytes(2, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo + frame


def _write_verbatim(w, samples, bps):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in samples:
        w.write(s & ((1 << bps) - 1), bps)


class TestFlacLpcAndStereo:
    def test_lpc_subframe_with_shift(self):
        coefs, shift, order = [3, -2], 1, 2
        samples = [100, 103]
        for i in range(2, 48):
            pred = (coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift
            samples.append(pred + (i % 5) - 2)  # small residuals

        def body(w):
            w.write(0, 1)
            w.write(0x20 | (order - 1), 6)  # LPC, order 2
            w.write(0, 1)
            for s in samples[:order]:
                w.write(s & 0xFFFF, 16)
            w.write(4 - 1, 4)   # precision 4 bits
            w.write(shift, 5)
            for c in coefs:
                w.write(c & 0xF, 4)
            w.write(0, 2)       # 4-bit rice
            w.write(0, 4)       # partition order 0
            k = 3
            w.write(k, 4)
            for i in range(order, len(samples)):
                pred = (coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift
                r = samples[i] - pred
                u = (r << 1) if r >= 0 else ((-r) << 1) - 1
                q, rem = u >> k, u & ((1 << k) - 1)
                for _ in range(q):
                    w.write(0, 1)
                w.write(1, 1)
                w.write(rem, k)

        out = decode_flac_samples(_frame_wrap(len(samples), 0x08, body))
        assert out is not None
        assert out["sample_sum"] == sum(samples)
        assert out["sample_min"] == min(samples)

    def test_mid_side_stereo(self):
        left = [(17 * i) % 301 - 150 for i in range(32)]
        right = [(11 * i) % 211 - 105 for i in range(32)]
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        side = [l - r for l, r in zip(left, right)]

        def body(w):
            _write_verbatim(w, mid, 16)
            _write_verbatim(w, side, 17)  # side carries the extra bit

        # byte3: channel code 10 (mid/side), bps 16 (100), reserved 0
        out = decode_flac_samples(_frame_wrap(32, 0xA8, body))
        assert out is not None
        assert out["n_samples"] == 64
        assert out["sample_sum"] == sum(left) + sum(right)
        assert out["sample_min"] == min(min(left), min(right))
        assert out["sample_max"] == max(max(left), max(right))

    def test_left_side_stereo(self):
        left = [200 + i for i in range(32)]
        right = [100 - i for i in range(32)]
        side = [l - r for l, r in zip(left, right)]

        def body(w):
            _write_verbatim(w, left, 16)
            _write_verbatim(w, side, 17)

        # byte3: channel code 8 (left/side), bps 16
        out = decode_flac_samples(_frame_wrap(32, 0x88, body))
        assert out is not None
        assert out["sample_sum"] == sum(left) + sum(right)


class TestImageDhash:
    def test_banded_pairs_equal_brute_force(self, spark):
        """The banded candidate generation must find EXACTLY the pairs
        a brute-force same-geometry scan finds (pigeonhole has no
        false negatives; the verify removes false positives)."""
        import pyspark.sql.functions as F

        from pasta_pipeline_spark.operators.multimodal import (
            image_dhash,
            image_dhash_bits,
            image_dhash_pairs,
            synthesize_media,
            _png_rgb,
            _synth_png_full,
        )

        ids = spark.range(150).select(F.col("id").alias("media_id"))
        media = synthesize_media(ids, variant="png_full")
        hashes = image_dhash(media)
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in image_dhash_pairs(hashes).collect()
        }
        # brute force locally
        local = {}
        for mid in range(150):
            w, h, px = _png_rgb(_synth_png_full(mid))
            local[mid] = (w, h, image_dhash_bits(w, h, px))
        exp = set()
        for a in range(150):
            for b in range(a + 1, 150):
                if local[a][:2] == local[b][:2]:
                    d = bin(local[a][2] ^ local[b][2]).count("1")
                    if d <= 5:
                        exp.add((a, b, d))
        assert got == exp and exp  # non-degenerate fixture

    def test_dhash_shift_invariance_contract(self):
        """Two images differing only by a constant luma offset WITHOUT
        wraparound share a dhash (the perceptual property); wraparound
        breaks ties — both directions exercised by the recipe."""
        from pasta_pipeline_spark.operators.multimodal import image_dhash_bits

        w, h = 6, 4
        base = bytes((13 * (i % (w * 3)) + 31 * (i // (w * 3))) % 200 for i in range(w * h * 3))
        shifted = bytes(min(255, v + 20) for v in base)  # no wrap below 235
        assert image_dhash_bits(w, h, base) == image_dhash_bits(w, h, shifted)


class TestVideoSceneCuts:
    def test_sad_matches_reference_and_cut_injection(self, spark):
        """A hand-built Y4M with one violent frame change must flag
        exactly that transition."""
        import pyspark.sql.functions as F  # noqa: F401

        from pasta_pipeline_spark.operators.multimodal import video_scene_cuts

        w, h = 4, 4
        f0 = bytes([10] * (w * h))
        f1 = bytes([12] * (w * h))   # SAD 2/px — below any threshold
        f2 = bytes([200] * (w * h))  # SAD 188/px — a hard cut
        chroma = bytes(w * h // 4)
        payload = b"YUV4MPEG2 W4 H4 F5:1 Ip A1:1 C420\n" + b"".join(
            b"FRAME\n" + f + chroma + chroma for f in (f0, f1, f2)
        )
        df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
        out = {r["frame_idx"]: r for r in video_scene_cuts(df).collect()}
        assert set(out) == {1, 2}
        assert out[1]["sad"] == 2 * w * h and not out[1]["is_cut"]
        assert out[2]["sad"] == 188 * w * h and out[2]["is_cut"]

    def test_synthesized_matches_closed_form(self, spark):
        import pyspark.sql.functions as F

        from pasta_pipeline_spark.operators.multimodal import (
            synthesize_media,
            video_scene_cuts,
        )

        ids = spark.range(6).select(F.col("id").alias("media_id"))
        out = video_scene_cuts(synthesize_media(ids, variant="video")).collect()
        for r in out:
            mid, f = r["media_id"], r["frame_idx"]
            w = 16 + (mid % 8) * 2
            h = 16 + ((mid // 7) % 8) * 2
            exp = sum(
                abs((i * 13 + mid + f * 31) % 256 - (i * 13 + mid + (f - 1) * 31) % 256)
                for i in range(w * h)
            )
            assert r["sad"] == exp


class TestAudioFingerprint:
    def test_gain_and_dc_invariance(self):
        from pasta_pipeline_spark.operators.multimodal import (
            audio_fingerprint_bits,
        )

        s = [((i * 37) % 211) - 100 for i in range(64)]
        gained = [v * 3 for v in s]
        shifted = [v + 500 for v in s]
        assert (
            audio_fingerprint_bits(s)
            == audio_fingerprint_bits(gained)
            == audio_fingerprint_bits(shifted)
        )
        inverted = [-v for v in s]
        assert audio_fingerprint_bits(s) != audio_fingerprint_bits(inverted)

    def test_pairs_through_real_decode(self, spark):
        import pyspark.sql.functions as F

        from pasta_pipeline_spark.operators.multimodal import (
            audio_fingerprint,
            audio_fingerprint_pairs,
            synthesize_media,
        )

        ids = spark.range(30).select(F.col("id").alias("media_id"))
        media = synthesize_media(ids, variant="flac_full")
        fps = audio_fingerprint(media)
        assert fps.count() == 30  # every payload decodes
        pairs = audio_fingerprint_pairs(fps).collect()
        # constant (silence-like) clips of equal length pair at hamming 0
        silence = [m for m in range(30) if m % 3 == 0]
        same_n = [
            (a, b)
            for a in silence
            for b in silence
            if a < b and a % 5 == b % 5
        ]
        got0 = {(r["id_a"], r["id_b"]) for r in pairs if r["hamming"] == 0}
        for p in same_n:
            assert p in got0


def test_cross_format_fingerprint_invariance():
    """The SAME clip fingerprints identically whether delivered as
    FLAC or as WAV — the container must not leak into the signature."""
    import struct

    from pasta_pipeline_spark.operators.multimodal import (
        _flac_sample,
        _synth_flac_full,
        audio_fingerprint_bits,
        decode_flac_stream,
        decode_wav_stream,
    )

    mid = 7  # variant 1: verbatim samples from the recipe
    samples = [_flac_sample(mid, i) for i in range(32 + (mid % 5) * 8)]
    # wrap the same samples as a minimal 16-bit mono WAV
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    flac_stream = decode_flac_stream(_synth_flac_full(mid))
    wav_stream = decode_wav_stream(wav)
    assert flac_stream == wav_stream == samples
    assert audio_fingerprint_bits(flac_stream) == audio_fingerprint_bits(wav_stream)
