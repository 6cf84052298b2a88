"""Training-data pipeline operators: dedup, similarity, QC, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import dedup, multimodal, similarity, textqc

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # append exact dups and near-dups with known ids
    extra = base.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    near = base.limit(3).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny tail change")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    df = base.unionByName(extra).unionByName(near).persist()
    df.count()
    yield df
    df.unpersist()


def test_exact_duplicate_groups(docs):
    groups = dedup.exact_duplicate_groups(docs).collect()
    assert len(groups) == 5
    for g in groups:
        assert g.dup_count == 2 and g.keep_id == min(g.member_ids)
        assert g.member_ids[1] == g.member_ids[0] + 100000


def test_dedupe_exact_keep_first(docs):
    out = dedup.dedupe_exact_keep_first(docs)
    assert out.count() == docs.count() - 5
    # the kept row of each dup group is the lowest doc_id
    assert out.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_minhash_near_duplicates(docs):
    pairs = dedup.minhash_near_duplicates(docs, jaccard_threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # exact dups (jaccard 1.0) and near dups (one appended token) all found
    for base_id in range(5):
        assert (base_id, base_id + 100000) in got
    for base_id in range(3):
        assert (base_id, base_id + 200000) in got
    # estimated jaccard of exact dup pairs is 1.0
    exact = pairs.filter((F.col("id_a") < 5) & (F.col("id_b") - F.col("id_a") == 100000))
    assert all(r.est_jaccard == 1.0 for r in exact.collect())


def test_simhash_near_duplicates(docs):
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for base_id in range(5):
        assert (base_id, base_id + 100000) in got  # identical text → hamming 0
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert all(ham[(i, i + 100000)] == 0 for i in range(5))


def test_ngram_jaccard(spark):
    pairs = spark.createDataFrame(
        [
            ("a b c d e", "a b c d e"),
            ("a b c d e", "a b c d x"),
            ("a b c", "x y z"),
        ],
        "text_a string, text_b string",
    )
    rows = dedup.ngram_jaccard(pairs, n=2).collect()
    assert rows[0].jaccard == 1.0
    assert 0 < rows[1].jaccard < 1.0
    assert rows[2].jaccard == 0.0


@pytest.fixture(scope="module")
def vectors(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def test_brute_force_topk_self_nearest(vectors):
    probes = vectors.limit(3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = similarity.brute_force_topk(vectors, probes, k=5)
    rows = out.filter("rank = 1").collect()
    # every probe's nearest neighbor is itself with cosine ≈ 1
    for r in rows:
        assert r.probe_id == r.vec_id and r.cosine > 0.999999
    assert out.groupBy("probe_id").count().filter("count != 5").count() == 0


def test_lsh_topk_recall_vs_exact(vectors):
    dim = len(vectors.first().embedding)
    probes = vectors.limit(5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = similarity.brute_force_topk(vectors, probes, k=5)
    # random 64-dim vectors are near-orthogonal (neighbor cosine ~0.3), so
    # honest recall needs wide buckets: few planes, many tables
    approx = similarity.lsh_topk(vectors, probes, dim=dim, k=5, num_planes=4, num_tables=16)
    e = {(r.probe_id, r.vec_id) for r in exact.collect()}
    a = {(r.probe_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6
    assert all((p, p) in a for p in [r.probe_id for r in probes.collect()])


def test_embedding_near_duplicates_finds_planted(spark, vectors):
    # plant two exact-duplicate vectors
    dup = vectors.limit(2).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding", "label"
    )
    corpus = vectors.unionByName(dup)
    dim = len(vectors.first().embedding)
    pairs = similarity.embedding_near_duplicates(corpus, dim=dim, cosine_threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 5000) in got and (1, 5001) in got


def test_quality_report_and_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that is good for the cat", "en"),
            (2, "der hund ist nicht mit der katze und das ist gut", "de"),
            (3, "el perro y la casa de los amigos en la calle", "es"),
            (4, "zz zz zz", None),
        ],
        "doc_id long, text string, lang string",
    )
    rep = textqc.quality_report(df).collect()
    by_id = {r.doc_id: r for r in rep}
    assert by_id[1].lang_pred == "en"
    assert by_id[2].lang_pred == "de"
    assert by_id[3].lang_pred == "es"
    assert by_id[4].lang_pred == "und"
    assert by_id[1].n_tokens == 13
    assert by_id[1].quality_score > by_id[4].quality_score


def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame([(" a  b\tc ",), ("",), ("Hello, world! 42",)], "text string")
    rows = df.select(
        textqc.col_token_count("text").alias("n"),
        textqc.col_bpe_ish_token_count("text").alias("bpe"),
        textqc.col_fingerprint("text").alias("fp"),
    ).collect()
    assert [r.n for r in rows] == [3, 0, 3]
    assert rows[2].bpe == 6  # Hello , world ! 4 2
    # fingerprint is whitespace/case-normalized
    fp2 = df.select(textqc.col_fingerprint(F.lit("A  B\nC")).alias("fp")).first().fp
    assert rows[0].fp == fp2


def test_winnowing_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p"), (2, "a b c d e f g h i j k l m n o p"), (3, "z y x w v u t s r q p o n m l k")],
        "doc_id long, text string",
    )
    fp = textqc.winnowing_fingerprints_udf(k=3, window=4)
    rows = df.select("doc_id", fp(F.col("text")).alias("fps")).collect()
    by_id = {r.doc_id: r.fps for r in rows}
    assert by_id[1] == by_id[2] and by_id[1] != by_id[3] and len(by_id[1]) > 0


def test_multimodal_plumbing(spark):
    media = multimodal.generate_media(spark, 20, kind="image")
    feats = multimodal.extract_image_features(media, out_dim=16)
    rows = feats.collect()
    assert len(rows) == 20 and all(len(r.embedding) == 16 for r in rows)
    # determinism: same payload → same embedding
    feats2 = {r.media_id: r.embedding for r in multimodal.extract_image_features(media, out_dim=16).collect()}
    assert all(feats2[r.media_id] == r.embedding for r in rows)

    videos = multimodal.generate_media(spark, 6, kind="video")
    frames = multimodal.sample_video_frames(videos, frames_per_video=3)
    assert frames.count() == 18
    assert frames.groupBy("media_id").count().filter("count != 3").count() == 0

    resized = multimodal.resize_images(media, max_px=128).collect()
    assert all(max(r.width, r.height) <= 128 for r in resized)


def test_multimodal_real_decode_is_gated(spark):
    media = multimodal.generate_media(spark, 2, kind="image")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        multimodal.extract_image_features(media, deterministic=False).collect()


# --- LSH-family scale guards (VERDICT r01 "what's wrong" 3-5) ---------------


def test_minhash_hot_bucket_guard_completes_without_quadratic_pairs(spark):
    """10k identical texts collapse into one bucket per band; the guard
    drops those buckets so the self-join never goes quadratic (identical
    content is exact-dedupe's job)."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10_000), "text": ["same boilerplate text here"] * 10_000})
    )
    out = dedup.minhash_near_duplicates(docs, max_bucket_size=500)
    assert out.count() == 0  # would be ~50M pairs unguarded
    # and the unguarded path on a SMALL clone group still finds the pairs
    small = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "text": ["same boilerplate text here"] * 4})
    )
    assert dedup.minhash_near_duplicates(small).count() == 6


def test_minhash_empty_text_short_circuit(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "text": ["", "  ", "", "alpha beta gamma delta", "alpha beta gamma delta", ""]})
    )
    out = dedup.minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    # empty docs never pair; the two real texts do
    assert [(r.id_a, r.id_b) for r in out] == [(3, 4)]
    sims = dedup.simhash_near_duplicates(docs).collect()
    assert [(r.id_a, r.id_b) for r in sims] == [(3, 4)]


def test_exact_duplicate_groups_member_cap(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(1000), "text": ["dup"] * 1000})
    )
    row = dedup.exact_duplicate_groups(docs, max_members=10).first()
    assert row.dup_count == 1000  # count stays exact
    assert row.keep_id == 0
    assert row.member_ids == list(range(10))  # sample bounded + sorted


def test_dedupe_exact_keep_first_groupby_form(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 3, 9, 1, 7], "text": ["a", "a", "b", "b", "c"]})
    )
    kept = sorted(r.doc_id for r in dedup.dedupe_exact_keep_first(docs).collect())
    assert kept == [1, 3, 7]


def test_embedding_near_dups_zero_vector_guard(spark):
    import pandas as pd

    rows = [{"vec_id": i, "embedding": [0.0] * 8} for i in range(5)]
    rows += [{"vec_id": 10, "embedding": [1.0, 0.0] * 4}, {"vec_id": 11, "embedding": [1.0, 0.001] * 4}]
    emb = spark.createDataFrame(pd.DataFrame(rows))
    out = similarity.embedding_near_duplicates(emb, dim=8, cosine_threshold=0.9)
    got = [(r.id_a, r.id_b) for r in out.collect()]
    assert got == [(10, 11)]  # zero vectors never pair


# --- real multimodal codecs (netpbm P6, WAV/PCM) ----------------------------


def test_ppm_roundtrip_and_features():
    import numpy as np

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(arr)) == arr).all()
    feats = multimodal.ppm_features(arr)
    assert abs(feats[0] - arr[:, :, 0].mean() / 255.0) < 1e-6


def test_wav_roundtrip_and_dominant_freq():
    import numpy as np

    t = np.arange(4000) / 16000
    samples = (np.sin(2 * np.pi * 440.0 * t) * 10000).astype("<i2")
    decoded, rate = multimodal.decode_wav(multimodal.encode_wav(samples))
    assert rate == 16000 and (decoded == samples).all()


def test_real_image_feature_extraction(spark):
    media = multimodal.generate_ppm_images(spark, 8)
    rows = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    assert len(rows) == 8
    # analytic check: id 0 → w=16, h=12; red channel = x-gradient
    r0 = rows[0]
    assert (r0.width, r0.height) == (16, 12)
    import numpy as np

    expected_red = np.mean([x * 255 // 15 for x in range(16)]) / 255.0
    assert abs(r0.embedding[0] - expected_red) < 1e-5


def test_real_audio_feature_extraction(spark):
    media = multimodal.generate_wav_audio(spark, 6)
    rows = {r.media_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert len(rows) == 6
    for i, r in rows.items():
        assert r.duration_ms == 250
        expected = 200.0 + (i % 40) * 50.0
        assert abs(r.dominant_hz - expected) < 5.0  # within one FFT bin
        assert r.rms > 5000


def test_real_ppm_resize(spark):
    media = multimodal.generate_ppm_images(spark, 4)
    out = {r.media_id: r for r in multimodal.resize_images(media, max_px=8).collect()}
    for i, r in out.items():
        assert max(r.width, r.height) <= 8
        arr = multimodal.decode_ppm(bytes(r.payload))
        assert arr.shape == (r.height, r.width, 3)


def test_decode_ppm_truncated_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n16")
    with _pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 4\n255\nxx")  # pixel data too short


def test_image_features_corrupt_ppm_yields_null_row(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame([
            {"media_id": 1, "url": "u", "kind": "image", "content_type": "image/x-portable-pixmap",
             "payload": b"P6\n16", "meta_width": None, "meta_height": None, "meta_duration_ms": None},
        ]), schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_image_features(df).first()
    assert row.width is None and row.embedding is None


def test_dedupe_keep_first_ties_and_nulls(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": pd.array([7, 7, 2, None, None], dtype="Int64"),
            "text": ["a", "a", "a", "b", "b"],
        })
    )
    kept = dedup.dedupe_exact_keep_first(docs).collect()
    by_text = {}
    for r in kept:
        by_text.setdefault(r.text, []).append(r.doc_id)
    assert by_text["a"] == [2]        # min wins, tie would keep only one
    assert by_text["b"] == [None] and len(by_text["b"]) == 1  # all-null keeps ONE
    # pure tie group
    ties = spark.createDataFrame(pd.DataFrame({"doc_id": [5, 5, 5], "text": ["t"] * 3}))
    assert dedup.dedupe_exact_keep_first(ties).count() == 1


def test_cross_source_dup_matrix(spark):
    from spider_spark.operators.dedup import cross_source_dup_matrix

    rows = [
        # wire copy on three hosts (one holds it twice)
        (0, "wire story", "ap"), (1, "wire story", "blogA"),
        (2, "wire story", "blogB"), (3, "wire story", "blogA"),
        # internal duplication only
        (4, "boilerplate", "blogB"), (5, "boilerplate", "blogB"),
        # unique content everywhere
        (6, "unique one", "ap"), (7, "unique two", "blogA"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["src_source"], r["dst_source"]): (r["n_shared_docs"], r["n_groups"])
        for r in cross_source_dup_matrix(df).collect()
    }
    # cross pairs: docs from both sides; blogA holds the wire copy twice
    assert got[("ap", "blogA")] == (3, 1)     # 1 (ap) + 2 (blogA)
    assert got[("ap", "blogB")] == (2, 1)
    assert got[("blogA", "blogB")] == (3, 1)
    # same-source: internal dup counts, >=2 docs required
    assert got[("blogB", "blogB")] == (2, 1)
    assert got[("blogA", "blogA")] == (2, 1)  # wire copy held twice
    assert ("ap", "ap") not in got            # no internal dup at ap
    assert len(got) == 5
