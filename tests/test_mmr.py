"""MMR diversification (similarity.mmr_select) — greedy reference
differential and the diversity behavior it exists for."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from spider_spark.operators import similarity


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def _ref_mmr(rows, k, lam, dp=6):
    picked, out = [], []
    remaining = {r[0]: r for r in rows}
    for rank in range(1, k + 1):
        best = None
        for rid, (i, rel, v) in remaining.items():
            if picked:
                sim = max(_cos(v, remaining_all[p][2]) for p in picked)
                score = round(lam * rel - (1 - lam) * sim, dp)
            else:
                score = round(rel, dp)
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, rel, score)
        if best is None:
            break
        _, i, rel, score = best
        picked.append(i)
        out.append((rank, i, round(rel, dp), score))
        del remaining[i]
    return out


def _rows():
    # cluster A: three near-identical high-rel vectors; B: distinct medium;
    # C: orthogonal low
    return [
        (1, 0.95, [1.0, 0.0, 0.0]),
        (2, 0.94, [0.999, 0.04, 0.0]),
        (3, 0.93, [0.998, 0.06, 0.0]),
        (4, 0.70, [0.0, 1.0, 0.0]),
        (5, 0.40, [0.0, 0.0, 1.0]),
    ]


@pytest.fixture()
def cands(spark):
    pdf = pd.DataFrame(_rows(), columns=["vec_id", "rel", "embedding"])
    return spark.createDataFrame(pdf)


def test_mmr_matches_greedy_reference(spark, cands):
    global remaining_all
    remaining_all = {r[0]: r for r in _rows()}
    got = [
        (r["rank"], r["id"], r["rel_r"], r["mmr_r"])
        for r in similarity.mmr_select(cands, k=4, lam=0.7).collect()
    ]
    want = _ref_mmr(_rows(), k=4, lam=0.7)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6)
        assert g[3] == pytest.approx(w[3], abs=2e-6)


def test_mmr_diversifies_past_the_duplicate_cluster(spark, cands):
    """Plain relevance order is 1,2,3 — MMR must break out of cluster A
    after one pick."""
    ids = [r["id"] for r in similarity.mmr_select(cands, k=3, lam=0.5).collect()]
    assert ids[0] == 1  # highest relevance first, always
    assert ids[1] == 4  # the distinct doc beats the near-duplicates
    assert 2 not in ids[:2] and 3 not in ids[:2]


def test_mmr_lambda_one_is_relevance_order(spark, cands):
    ids = [r["id"] for r in similarity.mmr_select(cands, k=5, lam=1.0).collect()]
    assert ids == [1, 2, 3, 4, 5]


def test_mmr_k_beyond_candidates_and_validation(spark, cands):
    got = similarity.mmr_select(cands, k=50, lam=0.7).collect()
    assert len(got) == 5  # stops when candidates run dry
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        similarity.mmr_select(cands, k=0)
    with pytest.raises(ValueError):
        similarity.mmr_select(cands, lam=1.5)
