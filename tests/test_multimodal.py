"""Multimodal plumbing: binary columns, metadata, mapInPandas batches."""

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
    decode_image_stub,
    documents_as_media,
    extract_features,
)


def test_media_table_schema(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "mime", "payload", "n_bytes",
    ]
    row = media.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")


def test_extract_features_batched(spark, sf_dir):
    media = documents_as_media(spark, sf_dir).limit(20)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == 4
        assert r["features"][0] == float(r["n_bytes"])  # moment 0 = length


def test_resize_stub_plumbing(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        documents_as_media, resize_stub,
    )
    media = documents_as_media(spark, sf_dir).limit(10)
    out = resize_stub(media, width=64, height=48)
    rows = out.collect()
    assert {r["width"] for r in rows} == {64}
    assert {r["height"] for r in rows} == {48}
    assert all(r["payload"] is not None for r in rows)


def test_frame_sample_stub_fanout(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        documents_as_media, frame_sample_stub,
    )
    media = documents_as_media(spark, sf_dir).limit(5)
    frames = frame_sample_stub(media, every_n_bytes=100, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        assert [r["frame_no"] for r in sorted(rows, key=lambda r: r["frame_no"])] \
            == list(range(len(rows)))
        assert len(rows) <= 3
        assert all(len(r["frame_payload"]) <= 100 for r in rows)


def test_sniff_mime_classifies_known_signatures(spark):
    """Crafted payloads with real container signatures + tricky
    near-misses: RIFF without WAVE is NOT wav; a payload whose TEXT
    starts with 'GIF89a' IS gif (sniffing is byte-prefix truth, not
    provenance); short payloads must not error."""
    from pyspark.sql import functions as F

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        sniff_mime,
    )

    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"x" * 10, "image/jpeg"),
        (2, b"\x89PNG\r\n\x1a\n" + b"x" * 10, "image/png"),
        (3, b"GIF89a-pretend-image", "image/gif"),
        (4, b"GIF87a" + b"y" * 3, "image/gif"),
        (5, b"RIFF\x01\x02\x03\x04WAVEfmt ", "audio/wav"),
        (6, b"RIFF\x01\x02\x03\x04AVI LIST", "text/plain"),  # RIFF but not WAVE
        (7, b"%PDF-1.7\n%stuff", "application/pdf"),
        (8, b"\x1f\x8b\x08rest-of-gzip", "application/gzip"),
        (9, b"plain old text", "text/plain"),
        (10, b"\xff\xd8", "text/plain"),  # too-short JPEG prefix
        (11, b"", "text/plain"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "media_id long, payload binary"
    )
    got = {
        r.media_id: r.mime
        for r in df.select("media_id", sniff_mime(F.col("payload")).alias("mime")).collect()
    }
    assert got == {i: m for i, _, m in rows}


def test_mixed_media_headers_roundtrip(spark, sf_dir):
    """documents_as_mixed_media must prepend exactly the doc_id%7 header
    and keep the text bytes intact after it."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        MAGIC_HEADERS,
        documents_as_mixed_media,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    text = {r.doc_id: r.text for r in
            load_table(spark, sf_dir, "documents").limit(50).collect()}
    media = {r.media_id: bytes(r.payload) for r in
             documents_as_mixed_media(spark, sf_dir).limit(50).collect()}
    checked = 0
    for mid, payload in media.items():
        if mid not in text:
            continue
        hdr = bytes.fromhex(MAGIC_HEADERS[mid % len(MAGIC_HEADERS)])
        assert payload == hdr + text[mid].encode("utf-8")
        checked += 1
    assert checked > 0


def test_byte_entropy_known_values(spark, monkeypatch):
    """Hand-computable entropies: uniform-2-symbol text = 1 bit/byte,
    single-symbol = 0 bits, 4 equiprobable symbols = 2 bits."""
    import math

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import multimodal
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_byte_entropy,
    )

    docs = spark.createDataFrame(
        [(1, "abababab"), (2, "zzzzz"), (3, "abcdabcd"), (4, "aab")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        multimodal, "load_table", lambda sp, sf, t: docs
    )
    got = {r.media_id: r for r in mm_byte_entropy(spark, "unused").collect()}
    assert got[1].entropy_bits == 1.0 and got[1].distinct_bytes == 2
    assert got[2].entropy_bits == 0.0 and got[2].n_bytes == 5
    assert got[3].entropy_bits == 2.0
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[4].entropy_bits - round(expect, 6)) < 2e-6


def test_decode_ppm_known_image():
    """Hand-built 2x1 P6 image: pixels (1,2,3) and (250,251,252)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        decode_ppm,
    )

    payload = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    got = decode_ppm(payload)
    assert got == {
        "width": 2, "height": 1, "n_pixels": 2,
        "sum_bytes": 759,
        "mean_milli": (759 * 1000) // 6,
        "min_byte": 1, "max_byte": 252,
    }
    # whitespace-variant header (single spaces) parses identically
    assert decode_ppm(b"P6 2 1 255\n" + bytes([1, 2, 3, 250, 251, 252])) == got


def test_decode_ppm_rejects_bad_payloads():
    import pytest as _pytest

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        decode_ppm,
    )

    with _pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"\x89PNG\r\n\x1a\nxxxx")
    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")  # 12 bytes needed, 2 given
    with _pytest.raises(ValueError, match="8-bit"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_roundtrip_synth_decode(spark, sf_dir):
    """The synthetic image table must decode back to its generation
    rule (real bytes through Arrow batches, not a shortcut)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_image_decode_stats,
    )

    rows = {r.media_id: r for r in
            mm_image_decode_stats(spark, sf_dir).limit(500).collect()}
    assert rows
    for mid, r in list(rows.items())[:20]:
        w, h = 4 + mid % 5, 4 + mid % 3
        assert (r.width, r.height) == (w, h)
        expect = sum((mid * k) % 256 for k in range(1, w * h * 3 + 1))
        assert r.sum_bytes == expect


def test_decode_wav_known_samples():
    """Hand-built mono 16-bit PCM WAV with samples [-2, 3, 32767]."""
    import struct

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        decode_wav_pcm,
    )

    data = struct.pack("<3h", -2, 3, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    got = decode_wav_pcm(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert got == {"sample_rate": 8000, "channels": 1, "n_samples": 3,
                   "sum_s": 32768, "sum_abs": 32772,
                   "min_s": -2, "max_s": 32767}


def test_decode_wav_rejects_bad_payloads():
    import struct

    import pytest as _pytest

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        decode_wav_pcm,
    )

    with _pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_pcm(b"OggS....whatever")
    # mu-law (format 7) must be refused, not mis-decoded
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x01")
    with _pytest.raises(ValueError, match="16-bit PCM"):
        decode_wav_pcm(b"RIFF" + struct.pack("<I", len(body)) + body)
    with _pytest.raises(ValueError, match="missing fmt"):
        decode_wav_pcm(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_y4m_sampler_honors_frame_boundaries():
    """3 frames of a 2x1 C444 clip; every_n=2 keeps frames 0 and 2.
    Luma is the FIRST third of each frame — a sampler that ignores
    plane layout would fold U/V bytes into the stats."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        sample_y4m_frames,
    )

    frames = [bytes([10, 20, 1, 1, 2, 2]),   # Y=[10,20] U=[1,1] V=[2,2]
              bytes([30, 40, 3, 3, 4, 4]),
              bytes([50, 60, 5, 5, 6, 6])]
    payload = b"YUV4MPEG2 W2 H1 F25:1 Ip A1:1 C444\n" + b"".join(
        b"FRAME\n" + f for f in frames)
    got = sample_y4m_frames(payload, every_n=2)
    assert got == [
        {"frame_no": 0, "y_sum": 30, "y_min": 10, "y_max": 20},
        {"frame_no": 2, "y_sum": 110, "y_min": 50, "y_max": 60},
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated frame"):
        sample_y4m_frames(payload[:-3])
    with _pytest.raises(ValueError, match="C444"):
        sample_y4m_frames(b"YUV4MPEG2 W2 H1 C420\nFRAME\n" + bytes(3))


def test_binary_column_parquet_roundtrip(spark, sf_dir, tmp_path):
    """Media tables persist: the mixed-signature binary column survives
    a parquet write/read byte-for-byte (digest-compared), and the
    read-back supports metadata-only pruning (n_bytes filter) without
    touching payloads."""
    from pyspark.sql import functions as F

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        documents_as_mixed_media,
    )

    media = documents_as_mixed_media(spark, sf_dir)
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["payload"] == "binary"

    def census(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.sha2("payload", 256))).alias("digest_sum"),
            F.sum("n_bytes").alias("bytes"),
        ).collect()[0]

    assert census(media) == census(back)


def test_crossmodal_topk_canonicalizes_duplicate_payloads(spark, tmp_path):
    """mm_crossmodal_topk contract on a planted fixture: docs 2 and 4
    carry IDENTICAL text, so any hit on doc 4 must retrieve canonical
    media id 2 with doc 2's digest (keep-first), while unique payloads
    canonicalize to themselves; n_bytes is the utf-8 byte length
    (doc 1 is multibyte). All six vectors sit in one IVF cell (tiny
    perturbations of CENTROIDS[0]) so every query's top-5 is the other
    five vectors — the hit list provably includes the duplicate."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_crossmodal_topk,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        CENTROIDS,
    )

    texts = ["alpha", "héllo", "same payload", "unique three",
             "same payload", "final text"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 6, pa.string()),
            "source": pa.array(["t"] * 6, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    rng = np.random.RandomState(3)
    c0 = np.array(CENTROIDS[0])
    vecs = [c0 / np.linalg.norm(c0) + 0.01 * rng.randn(64) for _ in range(6)]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 6, pa.int32()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    sf = str(tmp_path)

    rows = mm_crossmodal_topk(spark, sf).collect()
    by_qn = {(r.query_id, r.neighbor_id): r for r in rows}
    # one-cell corpus: every query retrieves all five others
    assert sorted({q for q, _ in by_qn}) == list(range(6))
    assert all(len([1 for q, n in by_qn if q == i]) == 5 for i in range(6))
    digest = {i: hashlib.sha256(t.encode()).hexdigest()
              for i, t in enumerate(texts)}
    for (q, n), r in by_qn.items():
        assert r.payload_sha256 == digest[n]
        assert r.n_bytes == len(texts[n].encode())
        assert r.canonical_media_id == (2 if n in (2, 4) else n), (
            "duplicate payload must retrieve its keep-first canonical")

    from tests.oracle_compare import compare, duckdb_conn

    import __spark_entry__ as e

    con = duckdb_conn(sf)
    ok, msg = compare(mm_crossmodal_topk(spark, sf), con,
                      e.oracle_sql()["mm_crossmodal_topk"])
    con.close()
    assert ok, msg


def test_crossmodal_recall_eval_envelope(spark, sf_dir):
    """The retrieval-quality census reports honestly (r12 task 4): one
    row per brute-force query, recall = hits / n_exact_canon bounded to
    [0, 1], hits never exceed the truth-set size, and the corpus-level
    mean clears a sanity floor (measured 0.44 at sf0.001 / 0.52 at
    sf0.01 for the untuned nprobe — the number this census exists to
    surface, mirroring ann_recall_eval's role for the id-level probe)."""
    from pyspark.sql import functions as F

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_crossmodal_recall_eval,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    out = mm_crossmodal_recall_eval(spark, sf_dir).cache()
    assert out.count() == N_QUERIES
    assert out.where(
        (F.col("recall") < 0) | (F.col("recall") > 1)
        | (F.col("hits") > F.col("n_exact_canon"))
        | (F.col("n_exact_canon") < 1) | (F.col("n_exact_canon") > TOPK)
    ).count() == 0
    mean_recall = out.agg(F.avg("recall")).collect()[0][0]
    assert mean_recall > 0.3
    out.unpersist()


def test_crossmodal_recall_collapses_duplicate_payloads(spark, tmp_path):
    """The contract that distinguishes this gate from ann_recall_eval:
    recall is scored at the CANONICAL-PAYLOAD level. Fixture: 60
    vectors in 3 tight cosine clusters (20 each), every doc in a
    cluster carrying the IDENTICAL payload text. Each query's exact
    top-5 neighbors are its own cluster's other copies — 5 distinct
    ids but ONE distinct payload — so n_exact_canon must collapse to 1
    (not TOPK=5) and a retriever that fetches ANY copy scores 1.0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_crossmodal_recall_eval,
    )

    rng = np.random.RandomState(11)
    centers = [rng.randn(64) * 4 for _ in range(3)]
    n = 60
    vecs = [centers[i % 3] + 0.01 * rng.randn(64) for i in range(n)]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n)], pa.int32()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    texts = [f"cluster {i % 3} shared payload text" for i in range(n)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s0"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )

    out = {r["query_id"]: r
           for r in mm_crossmodal_recall_eval(spark, str(tmp_path)).collect()}
    assert len(out) == 20  # N_QUERIES
    for qid, r in out.items():
        assert r["n_exact_canon"] == 1, (
            f"query {qid}: 5 same-payload neighbors must collapse to one "
            f"canonical, got {r['n_exact_canon']}")
        assert r["hits"] == 1 and r["recall"] == 1.0, (
            f"query {qid}: fetching any copy of the right payload is a hit")
