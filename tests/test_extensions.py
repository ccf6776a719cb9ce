"""Extension operator tests: dedup ladder on crafted near-duplicates,
similarity search sanity, text analysis, multimodal stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near-dup of 1
    (3, "completely different text about spark query engines and shuffles here"),
    (4, "THE QUICK  brown fox jumps over the lazy dog again and again today"),  # case/ws variant of 1
    (5, "short doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_fingerprint_collapses_case_and_whitespace(spark, docs):
    from pasta_pipeline_spark.operators.text_dedup import fingerprint_duplicate_groups

    groups = {r["keep_id"]: r["n_copies"] for r in fingerprint_duplicate_groups(docs, "doc_id", "text").collect()}
    assert groups[1] == 2  # docs 1 and 4 share a fingerprint


def test_jaccard_finds_near_dup_pair(spark, docs):
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.7
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical after normalization
    assert all(3 not in p for p in pairs)


def test_simhash_and_minhash_agree_on_near_dups(spark, docs):
    from pasta_pipeline_spark.operators.text_dedup import minhash_lsh_pairs, simhash_pairs

    sim = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs, "doc_id", "text", max_hamming=10).collect()}
    mh = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 4) in sim and (1, 4) in mh
    assert (1, 2) in mh


def test_cosine_topk_self_first(spark):
    from pasta_pipeline_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = emb.where("vec_id = 1").select(F.col("embedding").alias("qv"))
    got = [r["vec_id"] for r in cosine_topk(emb, q, k=2).collect()]
    assert got == [1, 2]


def test_lang_id_profiles(spark):
    from pasta_pipeline_spark.operators.text_analysis import detect_language

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "der Hund ist nicht das Problem und die Katze"),
            (3, "Привет мир это тест"),
            (4, "zxqw qwkj poiu"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", detect_language("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "ru", 4: "und"}


def test_quality_score_ordering(spark):
    from pasta_pipeline_spark.operators.text_analysis import quality_score

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs into the field " * 5),
            (2, "@@@ ### $$$ %%% ^^^"),
            (3, ""),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["q"] for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert got[1] > 0.7
    assert got[2] < 0.4
    assert got[3] == 0.0


def test_media_stub_and_frame_sampling(spark):
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        frame_sample_stub,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"fakepng"), 3500), (2, "video", bytearray(b"fakemp4"), 2500)],
        "media_id long, media_type string, payload binary, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["n_bytes"] == 7 and len(feats[1]["content_md5"]) == 32
    assert 1 <= feats[1]["width"] <= 1920

    frames = frame_sample_stub(media, every_ms=1000).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(per_media[1]) == [0, 1000, 2000, 3000]
    assert sorted(per_media[2]) == [0, 1000, 2000]


def test_real_wav_decode_chunk_walk():
    """decode_wav parses true WAV headers, including non-canonical
    chunk layouts (extra chunks before fmt/data, odd-sized word-padded
    chunks), and rejects non-WAV bytes."""
    import struct

    from pasta_pipeline_spark.operators.multimodal import decode_wav

    def wav(channels, rate, n_samples, extra_chunk=False):
        block = channels * 2
        data = bytes(n_samples * block)
        chunks = b""
        if extra_chunk:
            chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
        chunks += (
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        )
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    got = decode_wav(wav(2, 16000, 8000))
    assert got["sample_rate"] == 16000 and got["duration_ms"] == 500
    # extra pre-fmt chunk with odd size: the word-aligned walk still
    # lands on fmt/data
    got = decode_wav(wav(1, 8000, 4100, extra_chunk=True))
    assert got["sample_rate"] == 8000 and got["duration_ms"] == 4100 * 1000 // 8000
    assert decode_wav(b"RIFFxxxxAVI LIST") is None
    assert decode_wav(b"not audio at all") is None
    # truncated data chunk: duration reflects the bytes actually present
    w = wav(1, 8000, 1000)
    got = decode_wav(w[:-1600])  # drop 800 samples
    assert got["duration_ms"] == 200 * 1000 // 8000


def test_real_ppm_decode_header_scan():
    from pasta_pipeline_spark.operators.multimodal import decode_ppm

    img = b"P6\n640 480\n255\n" + bytes(640 * 480 * 3)
    got = decode_ppm(img)
    assert (got["width"], got["height"]) == (640, 480)
    # comments and arbitrary whitespace in the header
    img2 = b"P6\n# made by nobody\n 12\t34 # trailing\n255\n" + bytes(12 * 34 * 3)
    got2 = decode_ppm(img2)
    assert (got2["width"], got2["height"]) == (12, 34)
    assert decode_ppm(b"P3\n1 1\n255\n0 0 0") is None  # ASCII PPM is not P6
    assert decode_ppm(b"P6\ngarbage") is None


def test_synthesize_then_real_decode_roundtrip(spark):
    """End-to-end: synthesized WAV/PPM fixtures decode back to the
    id-derived ground truth through the Arrow-batched real path."""
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    ids = spark.range(0, 20).selectExpr("id AS media_id")
    feats = {
        r["media_id"]: r
        for r in extract_media_features(
            synthesize_media(ids), decode="real"
        ).collect()
    }
    for mid in range(0, 20, 2):  # WAV
        rate = 8000 + ((mid // 2) % 5) * 2000
        n_samples = 400 + (mid % 97) * 8
        r = feats[mid]
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == n_samples * 1000 // rate
        assert r["width"] is None
    for mid in range(1, 20, 2):  # PPM
        r = feats[mid]
        assert r["width"] == 16 + mid % 64
        assert r["height"] == 16 + (mid // 3) % 48
        assert r["sample_rate"] is None


def test_real_png_decode_ihdr():
    """decode_png parses the PNG signature + IHDR big-endian fields
    and rejects malformed containers (wrong magic, non-IHDR first
    chunk, truncated header, zero dimensions)."""
    import struct
    import zlib

    from pasta_pipeline_spark.operators.multimodal import decode_png

    def png(w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
        chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return b"\x89PNG\r\n\x1a\n" + chunk + b"rest-of-stream"

    got = decode_png(png(1920, 1080))
    assert (got["width"], got["height"]) == (1920, 1080)
    assert got["duration_ms"] is None and got["sample_rate"] is None
    # dims > 65535 exercise true 4-byte parsing (not 16-bit shortcuts)
    got = decode_png(png(70000, 3))
    assert (got["width"], got["height"]) == (70000, 3)
    assert decode_png(png(0, 10)) is None  # zero dimension
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10) is None  # truncated
    bad = png(5, 5)
    assert decode_png(bad[:12] + b"IDAT" + bad[16:]) is None  # first chunk not IHDR
    assert decode_png(b"\x89JNG\r\n\x1a\n" + bad[8:]) is None  # wrong magic


def test_real_flac_decode_streaminfo():
    """decode_flac walks the metadata-block list to STREAMINFO —
    including when a different block type precedes it — and unpacks
    the 20-bit rate / 36-bit total-sample fields exactly."""
    import struct

    from pasta_pipeline_spark.operators.multimodal import decode_flac

    def streaminfo(rate, ch, total):
        packed = (rate << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | total
        return (
            struct.pack(">HH", 4096, 4096)
            + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
            + struct.pack(">Q", packed) + bytes(16)
        )

    direct = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo(44100, 2, 441000)
    got = decode_flac(direct)
    assert got["sample_rate"] == 44100 and got["duration_ms"] == 10000
    # a VORBIS_COMMENT block (type 4) BEFORE streaminfo: the walk skips it
    vc = bytes([0x04]) + (6).to_bytes(3, "big") + b"x" * 6
    si = bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo(96000, 1, 12345)
    got = decode_flac(b"fLaC" + vc + si)
    assert got["sample_rate"] == 96000
    assert got["duration_ms"] == 12345 * 1000 // 96000
    # a 36-bit total-sample count above 2^32 survives the unpack
    big = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo(8000, 1, 2**35)
    assert decode_flac(big)["duration_ms"] == 2**35 * 1000 // 8000
    assert decode_flac(b"fLaX" + si) is None  # wrong magic
    assert decode_flac(b"fLaC" + bytes([0x81, 0, 0, 4]) + b"abcd") is None  # no streaminfo


def test_synthesize_containers_roundtrip(spark):
    """synthesize_media(variant='containers') PNG/FLAC fixtures decode
    back to the id-derived ground truth through the real path."""
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    ids = spark.range(0, 20).selectExpr("id AS media_id")
    feats = {
        r["media_id"]: r
        for r in extract_media_features(
            synthesize_media(ids, variant="containers"), decode="real"
        ).collect()
    }
    for mid in range(0, 20, 2):  # PNG
        r = feats[mid]
        assert r["media_type"] == "image/png"
        assert r["width"] == 32 + mid % 256
        assert r["height"] == 32 + (mid // 5) % 128
        assert r["n_bytes"] == 107 + mid % 100
        assert r["sample_rate"] is None
    for mid in range(1, 20, 2):  # FLAC
        rate = 8000 + (mid % 5) * 4000
        total = 10000 + (mid % 89) * 100
        r = feats[mid]
        assert r["media_type"] == "audio/flac"
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == total * 1000 // rate
        assert r["n_bytes"] == 72 + mid % 70
        assert r["width"] is None


def test_y4m_parse_and_frame_offsets():
    """YUV4MPEG2 header/frame walking: parameterized FRAME lines,
    truncated tails, and non-video bytes."""
    from pasta_pipeline_spark.operators.multimodal import (
        _parse_y4m_header,
        _y4m_frame_offsets,
        decode_y4m,
    )

    w, h = 4, 2
    frame = bytes(range(w * h)) + bytes(w * h // 4) + bytes(w * h // 4)
    raw = b"YUV4MPEG2 W4 H2 F10:1 Ip A1:1 C420\n"
    # second frame carries FRAME parameters (spec-legal)
    raw += b"FRAME\n" + frame + b"FRAME Ixyz\n" + frame
    hdr = _parse_y4m_header(raw)
    assert (hdr["width"], hdr["height"], hdr["fps_num"]) == (4, 2, 10)
    offs = _y4m_frame_offsets(raw, hdr)
    assert len(offs) == 2
    assert raw[offs[0]:offs[0] + w * h] == bytes(range(w * h))
    got = decode_y4m(raw)
    assert got["duration_ms"] == 2 * 1000 // 10
    # truncated final frame is not counted
    assert decode_y4m(raw[:-1])["duration_ms"] == 1 * 1000 // 10
    assert decode_y4m(b"RIFFnope") is None
    assert decode_y4m(b"YUV4MPEG2 W4\n") is None  # missing H/F


def test_sample_video_frames_decodes_ground_truth(spark):
    """sample_video_frames emits REAL per-frame features: luma sums
    and md5s match the fixture generator's ground truth computed
    directly from the id recipe — a seek/stride/plane-order bug would
    change them."""
    import hashlib

    from pasta_pipeline_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media,
    )

    ids = spark.range(0, 12).selectExpr("id AS media_id")
    media = synthesize_media(ids, variant="video")
    rows = sample_video_frames(media, every_ms=500).collect()
    assert rows
    by_key = {(r["media_id"], r["frame_ts_ms"]): r for r in rows}
    for mid in range(12):
        w = 16 + (mid % 8) * 2
        h = 16 + ((mid // 7) % 8) * 2
        fps = 5 + mid % 10
        nf = 3 + mid % 12
        dur = nf * 1000 // fps
        expected_ts = list(range(0, dur, 500))
        got_ts = sorted(ts for (m, ts) in by_key if m == mid)
        assert got_ts == expected_ts, mid
        for ts in expected_ts:
            fidx = min(ts * fps // 1000, nf - 1)
            plane = bytes((i * 13 + mid + fidx * 31) % 256 for i in range(w * h))
            r = by_key[(mid, ts)]
            assert r["frame_idx"] == fidx
            assert r["luma_sum"] == sum(plane)
            assert r["frame_md5"] == hashlib.md5(plane).hexdigest()
    # non-Y4M payloads produce no rows (documented)
    wav_media = synthesize_media(ids, variant="wav_ppm")
    assert sample_video_frames(wav_media).count() == 0


def test_real_jpeg_decode_marker_walk():
    """decode_jpeg walks marker segments to SOF, skipping APP/COM
    segments, handling progressive SOF2, and rejecting non-JPEGs."""
    from pasta_pipeline_spark.operators.multimodal import decode_jpeg

    def jpeg(w, h, sof=0xC0, pre=b""):
        sof_body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
        seg = bytes([0xFF, sof]) + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
        return b"\xff\xd8" + pre + seg + b"\xff\xd9"

    app0 = b"\xff\xe0" + (7).to_bytes(2, "big") + b"JFIF\x00"
    got = decode_jpeg(jpeg(1920, 1080, pre=app0))
    assert (got["width"], got["height"]) == (1920, 1080)
    got = decode_jpeg(jpeg(33, 44, sof=0xC2))  # progressive
    assert (got["width"], got["height"]) == (33, 44)
    # DHT (C4) is NOT a frame header — must be skipped, then SOF found
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    got = decode_jpeg(jpeg(5, 6, pre=dht))
    assert (got["width"], got["height"]) == (5, 6)
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # no SOF
    assert decode_jpeg(b"GIF89a") is None


def test_real_mp4_decode_box_walk():
    """decode_mp4 walks top-level boxes to moov/mvhd, handles a
    preceding child box, mvhd version 1 (64-bit duration), and
    rejects malformed sizes."""
    from pasta_pipeline_spark.operators.multimodal import decode_mp4

    def mp4(timescale, duration, v=0, pre_child=b""):
        if v == 1:
            body = bytes([1]) + bytes(3) + bytes(16) + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big") + bytes(80)
        else:
            body = bytes([0]) + bytes(3) + bytes(8) + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + bytes(80)
        mvhd = (8 + len(body)).to_bytes(4, "big") + b"mvhd" + body
        moov = (8 + len(pre_child) + len(mvhd)).to_bytes(4, "big") + b"moov" + pre_child + mvhd
        ftyp = (16).to_bytes(4, "big") + b"ftypisom" + bytes(4)
        return ftyp + moov

    got = decode_mp4(mp4(1000, 90_000))
    assert got["duration_ms"] == 90_000
    # an iods child before mvhd: the walk skips it
    iods = (12).to_bytes(4, "big") + b"iods" + bytes(4)
    got = decode_mp4(mp4(600, 1234, pre_child=iods))
    assert got["duration_ms"] == 1234 * 1000 // 600
    # version 1: 64-bit duration beyond 2^32
    got = decode_mp4(mp4(1000, 2**33, v=1))
    assert got["duration_ms"] == 2**33
    assert decode_mp4(b"\x00\x00\x00\x08ftyp") is None  # truncated
    assert decode_mp4(b"RIFFxxxxWAVE") is None


def test_synthesize_codecs_roundtrip(spark):
    """synthesize_media(variant='codecs') JPEG/MP4 fixtures decode
    back to the id-derived ground truth through the real path."""
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    ids = spark.range(0, 16).selectExpr("id AS media_id")
    feats = {
        r["media_id"]: r
        for r in extract_media_features(
            synthesize_media(ids, variant="codecs"), decode="real"
        ).collect()
    }
    for mid in range(0, 16, 2):  # JPEG
        r = feats[mid]
        assert r["media_type"] == "image/jpeg"
        assert r["width"] == 64 + mid % 512
        assert r["height"] == 48 + (mid // 3) % 256
        assert r["n_bytes"] == 47 + mid % 50
        assert r["duration_ms"] is None
    for mid in range(1, 16, 2):  # MP4
        ts = 1000 + (mid % 4) * 500
        du = 3000 + (mid % 77) * 100
        r = feats[mid]
        assert r["media_type"] == "video/mp4"
        assert r["duration_ms"] == du * 1000 // ts
        assert r["n_bytes"] == 150 + mid % 80
        assert r["width"] is None


def test_duplicate_clusters_transitive(spark):
    """A-B and B-C pairs must merge into one cluster labeled by the
    smallest id, with everything else a singleton survivor."""
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters

    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 3, 0.9), (3, 4, 0.8), (5, 6, 0.7)], "doc_a long, doc_b long, jaccard double"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in duplicate_clusters(ids, pairs).collect()
    }
    assert got == {
        1: (1, True),
        2: (2, True),
        3: (2, False),
        4: (2, False),   # transitively merged via 3
        5: (5, True),
        6: (5, False),
    }


def test_duplicate_clusters_checkpointed_long_chain(spark):
    """A 12-node path graph needs ~11 propagation rounds (the min label
    walks one hop per round) — with checkpoint_every=2 the lineage is
    truncated every other round, so the fixpoint completes with flat
    plans and the same answer; exercises >5 rounds per VERDICT #6."""
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)],
        "doc_a long, doc_b long, jaccard double",
    )
    rows = duplicate_clusters(
        ids, pairs, max_iterations=30, checkpoint_every=2
    ).collect()
    assert all(r["cluster_id"] == 0 for r in rows)
    assert {r["doc_id"] for r in rows if r["is_survivor"]} == {0}


def test_ivf_trained_centroids_improve_recall(spark):
    """Lloyd's-trained IVF cells must beat the lowest-id seed cells on
    a corpus with real cluster structure: 8 well-separated Gaussian
    clusters, probe 2 of 8 cells — trained centroids converge onto the
    true clusters so the query's cell contains its true neighbors.
    (The driver's synthetic embeddings table is structureless — within-
    label cosine ≈ cross-label ≈ 0 — so the improvement is only
    measurable on a clustered fixture.)"""
    import random

    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import cosine_topk, ivf_topk

    rnd = random.Random(7)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(8)]
    rows = [
        (ci * 50 + j, ci, [x + rnd.gauss(0, 0.08) for x in c])
        for ci, c in enumerate(centers)
        for j in range(50)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).cache()

    def avg_recall(train_iterations: int) -> float:
        total = 0.0
        for qid in (5, 77, 150, 222, 305):
            q = emb.where(F.col("vec_id") == qid).select(
                F.col("embedding").alias("qv")
            )
            exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
            got = {
                r["vec_id"]
                for r in ivf_topk(
                    emb, q, k=10, n_cells=8, n_probe=2,
                    train_iterations=train_iterations,
                ).collect()
            }
            total += len(got & exact) / 10
        return total / 5

    seeded, trained = avg_recall(0), avg_recall(3)
    emb.unpersist()
    assert trained > seeded, f"trained {trained} not above seeded {seeded}"
    assert trained >= 0.95


def test_duplicate_clusters_doubling_equivalent_and_fewer_rounds(spark):
    """Pointer-jumping mode reaches the identical fixpoint as plain
    min-label propagation on a long chain, in ~log(diameter) rounds
    instead of ~diameter."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters

    n = 33  # path graph 0-1-2-...-32: diameter 32
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    plain = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(ids, pairs, checkpoint_every=4).collect()
    }
    assert set(plain.values()) == {0}  # one component, min-labeled

    doubled = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(ids, pairs, checkpoint_every=4, doubling=True).collect()
    }
    assert doubled == plain  # identical fixpoint

    # round-count evidence: cap iterations below the chain diameter —
    # plain propagation CANNOT converge, doubling can
    partial = duplicate_clusters(ids, pairs, max_iterations=8, checkpoint_every=4, doubling=False)
    assert {r["cluster_id"] for r in partial.collect()} != {0}
    converged = duplicate_clusters(ids, pairs, max_iterations=8, checkpoint_every=4, doubling=True)
    assert {r["cluster_id"] for r in converged.collect()} == {0}


def test_quality_score_lang_profiles(spark):
    """The stopword component follows the document's language: a
    stopword-dense German text scores the same as the equivalent
    English one (quality_score would punish it), and an unprofiled
    language falls back to the best profile instead of zero."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.text_analysis import (
        quality_score,
        quality_score_lang,
    )

    en = "the cat and the dog in the house of the king is that good for all"
    de = "der hund und die katze ist nicht ein tier mit haus auf dem zu gut"
    df = spark.createDataFrame(
        [(1, en, "en"), (2, de, "de"), (3, de, "xx"), (4, de, "en")],
        "id long, text string, lang string",
    )
    rows = {
        r["id"]: (r["sl"], r["s"])
        for r in df.select(
            "id",
            quality_score_lang("text", "lang").alias("sl"),
            quality_score("text").alias("s"),
        ).collect()
    }
    # language-aware: German text under its own profile matches the
    # English text's stopword saturation
    assert abs(rows[1][0] - rows[2][0]) < 0.06
    # plain quality_score punishes the German text (en stopwords only)
    assert rows[2][0] > rows[2][1] + 0.15
    # unprofiled lang falls back to best-profile (== de here)
    assert rows[3][0] == rows[2][0]
    # declaring the WRONG profiled language does punish
    assert rows[4][0] < rows[2][0]


def test_extract_main_text_boilerplate_removal(spark):
    """Block heuristic end-to-end: scripts/styles vanish (including
    fake tags inside string literals), nav/footer link farms drop,
    prose with a low-density inline anchor survives, entity decode
    and whitespace collapse apply, all-boilerplate pages yield ''."""
    from pasta_pipeline_spark.operators.main_text import extract_main_text

    body = (
        "This is the actual article body with plenty of prose and enough "
        "characters to pass the minimum threshold, including an inline "
        '<a href="x">reference link</a> that stays under the density gate.'
    )
    html = (
        '<html><head><script>var x = "<p>fake</p>";</script>'
        "<style>.nav{color:red}</style></head><body>"
        '<nav><a href="/">Home</a> <a href="/about">About</a> <a>More</a></nav>'
        f"<p>  {body}  </p>"
        "<p>Second &amp; final paragraph&nbsp;with entities, long enough to "
        "be kept by the length gate of the extractor heuristic.</p>"
        '<div class="footer"><a>Terms</a> <a>Privacy</a></div></body></html>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<div><a>only</a> <a>links</a> <a>here</a></div>")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in extract_main_text(df).collect()}
    main = rows[1]["main_text"]
    assert "actual article body" in main and "reference link" in main
    assert "Second & final paragraph with entities" in main  # entities + nbsp
    assert "Home" not in main and "Terms" not in main        # boilerplate gone
    assert "fake" not in main and "color:red" not in main    # subtrees gone
    assert rows[1]["n_blocks_kept"] == 2
    assert main.index("actual article") < main.index("Second &")  # order kept
    assert rows[2]["main_text"] == "" and rows[2]["n_blocks_kept"] == 0


def test_script_mix_shares(spark):
    """Script histogram: shares over LETTER mass only (digits and
    punctuation excluded), exact basis points, zero-letter and NULL
    documents yield all-zero rows."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.text_analysis import script_mix

    df = spark.createDataFrame(
        [(1, "hello мир 世界"), (2, "123 !!!"), (3, None), (4, "καλημέρα")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in df.select("id", *script_mix("text")).collect()}
    assert rows[1]["n_script_chars"] == 10
    assert rows[1]["latin_bp"] == 5000
    assert rows[1]["cyrillic_bp"] == 3000
    assert rows[1]["cjk_bp"] == 2000
    assert rows[2]["n_script_chars"] == 0 and rows[2]["latin_bp"] == 0
    assert rows[3]["n_script_chars"] == 0
    assert rows[4]["greek_bp"] == 10000


def test_bpe_learning_differential(spark):
    """Distributed BPE learning matches an independent pure-Python
    implementation of Sennrich et al.'s algorithm (same tie-breaks):
    identical merge sequence AND identical segmentation on replay."""
    from collections import Counter

    from pasta_pipeline_spark.operators.bpe import END, apply_bpe, learn_bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low new",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # --- reference implementation (paper pseudocode, word-dist form)
    words = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) + [END] for w in words}

    def ref_merges(k):
        out = []
        for _ in range(k):
            pairs = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += words[w]
            if not pairs:
                break
            # argmax with (count desc, pair asc) tie-break
            (l, r), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((l, r))
            for w, syms in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                vocab[w] = merged
        return out

    expected = ref_merges(8)
    got = learn_bpe_merges(df, n_merges=8)
    assert [(l, r) for _, l, r in got] == expected

    # replaying the learned merges reproduces the reference vocab's
    # segmentation for every word
    seg = {r["doc_id"]: r for r in apply_bpe(df, got).collect()}
    doc0_words = texts[0].split()
    expect_tokens = [t for w in doc0_words for t in vocab[w]]
    assert seg[0]["bpe_tokens"] == expect_tokens
    assert seg[0]["n_tokens"] == len(expect_tokens)
    # frequent 'low' must have fused into few symbols
    assert vocab["low"] == ["low</w>"] or len(vocab["low"]) <= 2


def test_apply_bpe_batched_equals_expression_form(spark):
    """The Arrow-batched merge replay (constant plan depth — the
    production path) produces exactly the expression form's output;
    tokenization regex parity included (lowercase whitespace split)."""
    from pasta_pipeline_spark.operators.bpe import (
        apply_bpe,
        apply_bpe_batched,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(0, "low lower lowest low"), (1, "new newest  wide"), (2, "LOW NEW low")],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(df, n_merges=6)
    expr_form = {r["doc_id"]: (r["bpe_tokens"], r["n_tokens"])
                 for r in apply_bpe(df, merges).collect()}
    batched = {r["doc_id"]: (r["bpe_tokens"], r["n_tokens"])
               for r in apply_bpe_batched(df, merges).collect()}
    assert batched == expr_form


def test_png_full_pixel_decode(spark):
    """Complete PNG decode: synth fixtures round-trip through a real
    zlib stream and all five scanline filters; pixel and luma sums
    equal the closed-form recipe; corrupted DEFLATE data, truncated
    streams, and non-PNG payloads yield no row instead of crashing;
    multi-IDAT payloads concatenate correctly."""
    from pasta_pipeline_spark.operators.multimodal import (
        _synth_png_full,
        decode_image_pixels,
        decode_png_pixels,
    )

    # pure-Python contract incl. multi-IDAT splitting
    raw = _synth_png_full(42)
    f = decode_png_pixels(raw)
    w, h = 4 + 42 % 12, 4 + (42 // 3) % 10
    exp = sum((42 * 7 + y * 31 + x * 13 + c * 5) % 256
              for y in range(h) for x in range(w) for c in range(3))
    assert (f["width"], f["height"], f["pixel_sum"]) == (w, h, exp)

    import struct as st
    import zlib

    # split the IDAT into two chunks — decoders must concatenate
    sig_ihdr = raw[:8 + 25]
    (ilen,) = st.unpack(">I", raw[33:37])
    idat_data = raw[41:41 + ilen]
    mid_pt = len(idat_data) // 2

    def chunk(ctype, data):
        return (st.pack(">I", len(data)) + ctype + data
                + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    two = (sig_ihdr + chunk(b"IDAT", idat_data[:mid_pt])
           + chunk(b"IDAT", idat_data[mid_pt:]) + chunk(b"IEND", b""))
    assert decode_png_pixels(two) == f

    # corruption / malformed inputs -> None, never an exception
    assert decode_png_pixels(sig_ihdr + chunk(b"IDAT", b"\x00bogus") + chunk(b"IEND", b"")) is None
    assert decode_png_pixels(b"not a png at all") is None
    assert decode_png_pixels(raw[:40]) is None

    # Spark path: mixed batch of valid PNGs + junk -> rows only for valid
    rows = [(i, bytearray(_synth_png_full(i))) for i in range(6)]
    rows.append((99, bytearray(b"JUNK")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_image_pixels(df).collect()}
    assert set(got) == set(range(6))
    for i in range(6):
        wi, hi = 4 + i % 12, 4 + (i // 3) % 10
        expi = sum((i * 7 + y * 31 + x * 13 + c * 5) % 256
                   for y in range(hi) for x in range(wi) for c in range(3))
        assert (got[i]["width"], got[i]["height"], got[i]["pixel_sum"]) == (wi, hi, expi)


def test_gif_full_pixel_decode(spark):
    """Real LZW end to end: encoder/decoder round-trip under random
    and KwKwK-pathological inputs, whole-file decode matches the
    closed-form palette+index recipe, sub-block splitting at the
    255-byte boundary works (long images), and the Spark dispatch
    handles mixed PNG/GIF/junk batches."""
    import random

    from pasta_pipeline_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
        _synth_gif,
        _synth_png_full,
        decode_gif_pixels,
        decode_image_pixels,
    )

    rng = random.Random(11)
    for _ in range(50):
        idx = [rng.randrange(4) for _ in range(rng.randint(1, 2000))]
        assert _gif_lzw_decode(_gif_lzw_encode(idx, 2), 2) == idx
    assert _gif_lzw_decode(_gif_lzw_encode([3] * 5000, 2), 2) == [3] * 5000

    for mid in (0, 13, 977):
        f = decode_gif_pixels(_synth_gif(mid))
        w, h = 4 + mid % 10, 4 + (mid // 3) % 8
        pal = [[(mid * (5 + c * 6) + i * (7 + c * 6)) % 256 for c in range(3)]
               for i in range(4)]
        idx = [(mid + x * 3 + y * 5) % 4 for y in range(h) for x in range(w)]
        assert (f["width"], f["height"]) == (w, h)
        assert f["pixel_sum"] == sum(sum(pal[i]) for i in idx)

    assert decode_gif_pixels(b"GIF89a junk") is None
    assert decode_gif_pixels(_synth_gif(3)[:25]) is None

    rows = [(1, bytearray(_synth_gif(1))), (2, bytearray(_synth_png_full(2))),
            (3, bytearray(b"JUNK"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"] for r in decode_image_pixels(df).collect()}
    assert got == {1, 2}


def test_jpeg_full_pixel_decode(spark):
    """Baseline JPEG (ITU T.81) end to end. Three layers:

    1. closed-form fixtures: DC-only blocks through the REAL Huffman
       scan (differential DC categories, EOB'd AC, byte unstuffing)
       decode to exactly the id recipe's RGB sums;
    2. general AC/IDCT path: arbitrary pixel blocks forward-DCT'd,
       run-length entropy-coded (incl. ZRL runs), and reconstructed
       within the T.81 accuracy envelope (|err| <= 2 per sample) —
       both grayscale and 3-component color;
    3. robustness: truncated scans, non-JPEGs, progressive and
       subsampled frames yield None; the Spark dispatch handles
       mixed PNG/GIF/JPEG/junk batches.
    """
    import math
    import random

    from pasta_pipeline_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _decode_jpeg_planes,
        _jpeg_encode_scan,
        _jpeg_wrap_stream,
        _synth_gif,
        _synth_jpeg_full,
        _synth_png_full,
        decode_image_pixels,
        decode_jpeg_pixels,
    )

    def rgb(y, cb, cr):
        cb -= 128
        cr -= 128
        cl = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
        return (
            cl(y + ((91881 * cr + 32768) >> 16)),
            cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
            cl(y + ((116130 * cb + 32768) >> 16)),
        )

    # 1. closed-form fixture decode
    for mid in (0, 7, 42, 977):
        got = decode_jpeg_pixels(_synth_jpeg_full(mid))
        w, h = 8 * (1 + mid % 3), 8 * (1 + (mid // 3) % 2)
        ps = ls = 0
        for b in range((w // 8) * (h // 8)):
            r, g, bl = rgb(
                128 + (mid * 7 + b * 13) % 200 - 100,
                128 + (mid * 5 + b * 11) % 120 - 60,
                128 + (mid * 3 + b * 17) % 120 - 60,
            )
            ps += 64 * (r + g + bl)
            ls += 64 * (299 * r + 587 * g + 114 * bl)
        assert got == {
            "width": w, "height": h, "n_pixels": w * h,
            "pixel_sum": ps, "luma_sum": ls,
        }

    # 2. general path: FDCT -> entropy code -> decode, per-sample bound
    C = [math.sqrt(0.5)] + [1.0] * 7

    def fdct_zigzag(px):
        out = [0.0] * 64
        for u in range(8):
            for v in range(8):
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (
                            (px[y * 8 + x] - 128)
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[v * 8 + u] = 0.25 * C[u] * C[v] * s
        return [int(math.floor(out[_JPEG_ZIGZAG[k]] + 0.5)) for k in range(64)]

    rng = random.Random(23)
    # sparse blocks force long zero runs (ZRL symbols); dense are random
    gray_pixels = [
        [rng.randrange(256) for _ in range(64)],
        [128] * 32 + [255] * 32,
        [(x * 37) % 256 for x in range(64)],
        [0] * 63 + [255],
    ]
    blocks = [fdct_zigzag(px) for px in gray_pixels]
    raw = _jpeg_wrap_stream(16, 16, 1, _jpeg_encode_scan([blocks]), [1] * 64)
    w, h, planes = _decode_jpeg_planes(raw)
    assert (w, h) == (16, 16)
    for bi, px in enumerate(gray_pixels):
        byy, bxx = divmod(bi, 2)
        for yy in range(8):
            for xx in range(8):
                got = planes[0][(byy * 8 + yy) * 16 + bxx * 8 + xx]
                assert abs(got - px[yy * 8 + xx]) <= 2

    # color: 3 interleaved components, one block each
    comp_pixels = [[rng.randrange(256) for _ in range(64)] for _ in range(3)]
    raw3 = _jpeg_wrap_stream(
        8, 8, 3,
        _jpeg_encode_scan([[fdct_zigzag(px)] for px in comp_pixels]),
        [1] * 64,
    )
    w3, h3, planes3 = _decode_jpeg_planes(raw3)
    assert (w3, h3) == (8, 8)
    for ci in range(3):
        for i in range(64):
            assert abs(planes3[ci][i] - comp_pixels[ci][i]) <= 2

    # 3. robustness
    full = _synth_jpeg_full(5)
    assert decode_jpeg_pixels(full[:len(full) // 2]) is None  # truncated scan
    assert decode_jpeg_pixels(b"not a jpeg") is None
    # progressive (SOF2) frames are out of scope -> None
    prog = bytearray(full)
    sof_at = full.index(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None
    # subsampled chroma (2x2 luma sampling factor) -> None
    sub = bytearray(full)
    sub[sof_at + 11] = 0x22  # first component's sampling byte
    assert decode_jpeg_pixels(bytes(sub)) is None

    rows = [
        (1, bytearray(_synth_jpeg_full(1))),
        (2, bytearray(_synth_png_full(2))),
        (3, bytearray(_synth_gif(3))),
        (4, bytearray(b"JUNK")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"] for r in decode_image_pixels(df).collect()}
    assert got == {1, 2, 3}


def test_bpe_batched_equals_sequential_with_fewer_rounds(spark):
    """The batched trainer (default path) learns the IDENTICAL merge
    sequence to the classic one-merge-per-round loop, in >=4x fewer
    driver round-trips on a corpus with independent frequent families
    — and stays identical on the heavily-chained low/new/wide corpus
    where safety forces small batches."""
    from pasta_pipeline_spark.operators.bpe import (
        learn_bpe_merges_batched,
        learn_bpe_merges_sequential,
    )

    # 6 families with disjoint alphabets: two words per family share a
    # suffix letter, so the end pair (y_i, </w>) aggregates ABOVE the
    # in-word pairs — round 1 safely accepts all six end merges
    # together (same </w> right symbol never chains), round 2 the
    # per-family continuations, etc.
    fams = ["xyz", "abc", "def", "ghi", "jkl", "mno"]
    words = []
    for i, f in enumerate(fams):
        words += [f[0] + f[1]] * (20 + i)       # "xy" etc.
        words += [f[2] + f[1]] * (14 + 2 * i)   # "zy" etc.
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")

    seq = learn_bpe_merges_sequential(df, n_merges=12)
    batched, rounds = learn_bpe_merges_batched(
        df, n_merges=12, batch_size=8, return_rounds=True
    )
    assert batched == seq
    assert rounds * 4 <= 12, rounds  # >=4x fewer driver round-trips

    # chained corpus: batches shrink to stay safe, sequence still equal
    df2 = spark.createDataFrame(
        [(0, "low lower lowest low low"), (1, "new newer newest new newer"),
         (2, "wide wider widest low new")],
        "doc_id long, text string",
    )
    seq2 = learn_bpe_merges_sequential(df2, n_merges=8)
    assert learn_bpe_merges_batched(df2, n_merges=8) == seq2


def test_bpe_batched_equals_sequential_randomized(spark):
    """Randomized differential: on arbitrary small corpora (heavy
    ties, chained merges, self-pairs, shared suffixes) the batched
    trainer's merge list equals the sequential algorithm's exactly."""
    import random

    from pasta_pipeline_spark.operators.bpe import (
        learn_bpe_merges_batched,
        learn_bpe_merges_sequential,
    )

    rng = random.Random(31)
    alphabet = "abcde"
    for trial in range(6):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(4, 10))
        ]
        text = " ".join(w for w in words for _ in range(rng.randint(1, 6)))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        seq = learn_bpe_merges_sequential(df, n_merges=10)
        bat = learn_bpe_merges_batched(df, n_merges=10, batch_size=4)
        assert bat == seq, (trial, text, seq, bat)


def test_prefix_jaccard_equals_inverted_index(spark):
    """PPJoin-style prefix filtering returns exactly the inverted-index
    tier's rows — including threshold-boundary pairs (J == t, where a
    float-sloppy length filter would drop them) and near-identical
    docs — across several thresholds."""
    from pasta_pipeline_spark.operators.text_dedup import (
        jaccard_pairs,
        prefix_jaccard_pairs,
    )

    base = "w%d " * 10
    docs = [
        (1, " ".join(f"w{i}" for i in range(12))),
        (2, " ".join(f"w{i}" for i in range(12))),          # identical to 1
        (3, " ".join(f"w{i}" for i in range(2, 14))),       # shifted overlap
        (4, " ".join(f"w{i}" for i in range(6, 12))),       # subset-ish, short
        (5, "x0 x1 x2 x3 x4 x5 x6 x7"),                     # disjoint
        (6, " ".join(f"w{i}" for i in range(12)) + " tail"),# superset of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.5, 0.6, 0.75):
        ref = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
            for r in jaccard_pairs(df, "doc_id", "text", n=3, threshold=t).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
            for r in prefix_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        assert got == ref, (t, got ^ ref)
    # sanity: the identical pair is present with J == 1.0
    got05 = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert got05[(1, 2)] == 1.0
