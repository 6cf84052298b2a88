"""CombSUM/CombMNZ fusion + team-draft interleaving (operators/index.py)."""

from __future__ import annotations

import hashlib

import pytest

from spider_spark.operators import index as ix


def _run_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score_r double")


def test_comb_fusion_brute_force(spark):
    r1 = [(0, 10.0), (1, 5.0), (2, 0.0)]
    r2 = [(1, 2.0), (2, 4.0), (3, 3.0)]
    got = {
        r["doc_id"]: (r["n_lists"], r["combsum_r"], r["combmnz_r"])
        for r in ix.comb_fusion(
            [_run_df(spark, r1), _run_df(spark, r2)]
        ).collect()
    }

    def norm(rows):
        lo = min(s for _, s in rows)
        hi = max(s for _, s in rows)
        return {d: (s - lo) / (hi - lo) if hi > lo else 1.0 for d, s in rows}

    n1, n2 = norm(r1), norm(r2)
    want = {}
    for d in {0, 1, 2, 3}:
        parts = [n[d] for n in (n1, n2) if d in n]
        want[d] = (
            len(parts),
            round(sum(parts), 6),
            round(sum(parts) * len(parts), 6),
        )
    assert got == want
    # MNZ rewards corroboration: doc 1 and 2 (both lists) out-fuse doc 0
    # (one list, even at norm 1.0) under MNZ
    assert got[2][2] > got[0][2]


def test_comb_fusion_constant_run_and_validation(spark):
    flat = [(0, 7.0), (1, 7.0)]
    got = {
        r["doc_id"]: r["combsum_r"]
        for r in ix.comb_fusion([_run_df(spark, flat)]).collect()
    }
    assert got == {0: 1.0, 1: 1.0}
    with pytest.raises(ValueError):
        ix.comb_fusion([])


def _lists(spark, q, ra, rb):
    a = spark.createDataFrame(
        [(q, d, i + 1) for i, d in enumerate(ra)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(q, d, i + 1) for i, d in enumerate(rb)],
        "query_id string, doc_id long, rank int",
    )
    return a, b


def _brute_draft(q, ra, rb):
    chosen, out, ptr, rnd = set(), [], {"a": 0, "b": 0}, 0
    runs = {"a": ra, "b": rb}
    while ptr["a"] < len(ra) or ptr["b"] < len(rb):
        coin = int(hashlib.md5(f"{q}:{rnd}".encode()).hexdigest()[:8], 16) % 2
        order = ("a", "b") if coin == 0 else ("b", "a")
        progressed = False
        for team in order:
            lst, p = runs[team], ptr[team]
            while p < len(lst) and lst[p] in chosen:
                p += 1
            ptr[team] = p
            if p < len(lst):
                chosen.add(lst[p])
                ptr[team] = p + 1
                out.append((len(out) + 1, lst[p], team))
                progressed = True
        if not progressed:
            break
        rnd += 1
    return out


def test_team_draft_matches_reference(spark):
    ra, rb = [1, 2, 3, 4], [3, 5, 1, 6]
    a, b = _lists(spark, "q0", ra, rb)
    got = [
        (r["pos"], r["doc_id"], r["team"])
        for r in sorted(
            ix.team_draft_interleave(a, b).collect(), key=lambda r: r["pos"]
        )
    ]
    assert got == _brute_draft("q0", ra, rb)
    # every doc appears exactly once, all docs covered
    docs = [d for _, d, _ in got]
    assert sorted(docs) == sorted(set(ra) | set(rb))


def test_team_draft_multi_query_independent(spark):
    a1, b1 = _lists(spark, "qA", [1, 2], [2, 3])
    a2, b2 = _lists(spark, "qB", [7, 8], [9])
    a = a1.unionByName(a2)
    b = b1.unionByName(b2)
    rows = ix.team_draft_interleave(a, b).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["pos"], r["doc_id"], r["team"])
        )
    assert sorted(by_q["qA"]) == _brute_draft("qA", [1, 2], [2, 3])
    assert sorted(by_q["qB"]) == _brute_draft("qB", [7, 8], [9])


def test_team_draft_deterministic_across_partitioning(spark):
    ra, rb = list(range(1, 9)), list(range(5, 13))
    a, b = _lists(spark, "qz", ra, rb)
    one = sorted(
        (r["pos"], r["doc_id"], r["team"])
        for r in ix.team_draft_interleave(
            a.repartition(1), b.repartition(1)
        ).collect()
    )
    many = sorted(
        (r["pos"], r["doc_id"], r["team"])
        for r in ix.team_draft_interleave(
            a.repartition(7), b.repartition(5)
        ).collect()
    )
    assert one == many
