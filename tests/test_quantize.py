"""Int8 embedding quantization (similarity.quantize_embeddings_int8)."""

from __future__ import annotations

import math

from spider_spark.operators import similarity as sim


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute(vec):
    if vec is None:
        return None
    xd = [float(v) for v in vec]
    amax = max((abs(v) for v in xd), default=None)
    if amax is None:
        return (0, None, [], None)
    if amax == 0:
        return (len(xd), 0.0, [0] * len(xd), 0.0)
    s = amax / 127.0
    q = [max(-127.0, min(127.0, math.floor(v / s + 0.5))) for v in xd]
    err = max(abs(v - qq * s) for v, qq in zip(xd, q))
    return (len(xd), round(s, 6), [int(v) for v in q], round(err, 6))


def _run(spark, rows):
    return {
        r["vec_id"]: (r["dim"], r["scale_r"], r["qvec"], r["max_abs_err_r"])
        for r in sim.quantize_embeddings_int8(_emb(spark, rows)).collect()
    }


def test_known_values(spark):
    got = _run(spark, [(0, [1.0, -0.5, 0.25])])
    dim, s, q, err = got[0]
    assert dim == 3
    assert abs(s - round(1.0 / 127, 6)) < 1e-9
    # x/s: 127, -63.5, 31.75 -> floor(+0.5): 127, -63, 32
    assert q == [127, -63, 32]
    assert err is not None and err <= (1.0 / 127) / 2 + 1e-9


def test_max_element_hits_127_and_zero_vec(spark):
    got = _run(spark, [(0, [2.0, 2.0]), (1, [0.0, 0.0])])
    assert got[0][2] == [127, 127]
    assert got[1] == (2, 0.0, [0, 0], 0.0)


def test_negative_max_and_bound(spark):
    got = _run(spark, [(0, [-3.0, 1.5])])
    assert got[0][2] == [-127, 64]  # 1.5/(3/127)=63.5 -> floor+0.5 = 64


def test_differential_vs_bruteforce(spark):
    rows, x = [], 13
    for i in range(50):
        vec = []
        for _ in range(16):
            x = (x * 1103515245 + 12345) % (2**31)
            vec.append((x % 2001 - 1000) / 250.0)
        rows.append((i, vec))
    want = {i: _brute(v) for i, v in rows}
    got = _run(spark, rows)
    for i in want:
        w, g = want[i], got[i]
        assert g[0] == w[0] and g[2] == w[2], i
        assert abs(g[1] - w[1]) < 1e-9 and abs(g[3] - w[3]) < 1e-9, i


def test_null_vector_passes_through(spark):
    got = _run(spark, [(0, None)])
    assert got[0][1] is None and got[0][2] is None and got[0][3] is None
