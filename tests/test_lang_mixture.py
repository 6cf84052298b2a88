"""Per-segment language-mixture screening (langid.lang_mixture)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import langid as li


def _train(spark):
    # two synthetic "languages" with disjoint character distributions
    rows = [(i, "aba bab aab abb"[: 8 + i % 6], "aa") for i in range(8)] + [
        (100 + i, "zyz yzy zzy zyy"[: 8 + i % 6], "zz") for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return li.train_nb_langid(docs)


def test_token_window_segments(spark):
    docs = spark.createDataFrame(
        [(0, "  a b  c d e  "), (1, None), (2, ""), (3, "x")],
        "doc_id long, text string",
    )
    rows = li.token_window_segments(docs, window_tokens=2).collect()
    got = {(r["doc_id"], r["p_idx"]): r["text"] for r in rows}
    assert got == {(0, 0): "a b", (0, 1): "c d", (0, 2): "e", (3, 0): "x"}


def test_mixture_flags_code_switching_doc(spark):
    grams, labels = _train(spark)
    probe = spark.createDataFrame(
        [
            (0, "aba bab aab aba bab aab"),              # pure aa
            (1, "aba bab zyz yzy zzy zyy zyz yzy"),      # 1/4 aa, 3/4 zz
        ],
        "doc_id long, text string",
    )
    segs = li.token_window_segments(probe, window_tokens=2)
    # nb_classify needs one id col: key segments by a composite string
    segs_keyed = segs.select(
        F.concat_ws(":", "doc_id", "p_idx").alias("seg"), "text"
    )
    preds = li.nb_classify(segs_keyed, grams, labels, id_col="seg")
    preds = preds.withColumn(
        "doc_id", F.split("seg", ":")[0].cast("long")
    )
    mix = {
        r["doc_id"]: (
            r["n_segments"],
            r["n_langs"],
            r["majority_lang"],
            r["majority_frac_r"],
        )
        for r in li.lang_mixture(preds).collect()
    }
    assert mix[0] == (3, 1, "aa", 1.0)
    assert mix[1] == (4, 2, "zz", 0.75)


def test_majority_tie_breaks_to_greatest_label(spark):
    preds = spark.createDataFrame(
        [(0, "aa"), (0, "zz"), (0, "aa"), (0, "zz")],
        "doc_id long, pred_label string",
    )
    row = li.lang_mixture(preds).collect()[0]
    assert (row["majority_lang"], row["majority_frac_r"]) == ("zz", 0.5)


def test_rollup_brute_force(spark):
    import collections

    rows = [(i % 5, "lang%d" % ((i * 3) % 4)) for i in range(40)]
    preds = spark.createDataFrame(rows, "doc_id long, pred_label string")
    got = {
        r["doc_id"]: (r["n_segments"], r["n_langs"], r["majority_lang"])
        for r in li.lang_mixture(preds).collect()
    }
    want = {}
    for d in set(r[0] for r in rows):
        c = collections.Counter(l for dd, l in rows if dd == d)
        maj = max(c.items(), key=lambda kv: (kv[1], kv[0]))[0]
        want[d] = (sum(c.values()), len(c), maj)
    assert got == want


def test_segment_validation(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        li.token_window_segments(docs, window_tokens=0)


def test_declared_lang_mismatch_quote_styles_and_gating(spark):
    from spider_spark.operators.langid import declared_lang_mismatch

    en = "the of and to in is was for on with"
    de = "der die und das nicht von zu mit sich auf"
    cases = [
        # declared de, text en → mismatch
        (0, '<html lang="de"><body>x</body></html>', en, "de", "en", True),
        # region subtag trimmed, single quotes
        (1, "<html lang='en-GB'>", en, "en", "en", False),
        # unquoted, uppercase tag normalized
        (2, "<html LANG=FR-ca>", de, "fr", "de", True),
        # xml:lang also declares
        (3, '<html xml:lang="es">', en, "es", "en", True),
        # no attribute → never accuses
        (4, "<html><body></body></html>", en, None, "en", False),
        # declared but detection undetermined → never accuses
        (5, '<html lang="en">', "zzz qqq", "en", "und", False),
        # null html
        (6, None, en, None, "en", False),
    ]
    df = spark.createDataFrame(
        [(i, h, t) for i, h, t, *_ in cases],
        "doc_id long, html string, text string",
    )
    got = {
        r["id"]: (r["declared_lang"], r["detected_lang"], r["mismatch"])
        for r in declared_lang_mismatch(df, id_col="doc_id").collect()
    }
    for i, _, _, dec, det, mm in cases:
        assert got[i] == (dec, det, mm), i
