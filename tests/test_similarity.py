"""Golden tests for the batched string-similarity kernels.

JW golden values follow ``jellyfish.jaro_winkler_similarity`` semantics
(the reference's comparator, ``src/blocking/generate.py:72,90``), verified
char-exact against DuckDB's jaro_winkler_similarity as a second opinion.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.functions.similarity import (
    jaro_winkler_np,
    jw_sim,
    levenshtein_sim,
    token_jaccard,
    token_jaccard_np,
)

GOLDEN = [
    ("martha", "marhta", 0.9611),
    ("dwayne", "duane", 0.84),
    ("dixon", "dicksonx", 0.8133),
    ("jellyfish", "smellyfish", 0.8963),
    ("toyota", "toyota", 1.0),
    ("a", "a", 1.0),
    ("", "", 0.0),
    ("abc", "", 0.0),
    ("ab", "ba", 0.0),  # window 0 -> no matches (jellyfish semantics)
]


def test_jw_golden_values():
    got = jaro_winkler_np([c[0] for c in GOLDEN], [c[1] for c in GOLDEN])
    for (a, b, exp), g in zip(GOLDEN, got):
        assert abs(g - exp) < 5e-4, (a, b, exp, g)


def test_jw_none_is_empty():
    got = jaro_winkler_np([None, "x"], ["x", None])
    assert (got == 0.0).all()


def test_jw_matches_duckdb_randomized():
    rng = np.random.default_rng(7)
    vocab = list("abcdefghij xyz")
    pairs = [
        (
            "".join(rng.choice(vocab, rng.integers(0, 20))),
            "".join(rng.choice(vocab, rng.integers(0, 20))),
        )
        for _ in range(1500)
    ]
    df = pd.DataFrame(pairs, columns=["a", "b"])
    oracle = (
        duckdb.connect()
        .execute("select jaro_winkler_similarity(a, b) s from df")
        .df()["s"]
        .to_numpy()
    )
    mine = jaro_winkler_np(df.a, df.b)
    assert np.abs(oracle - mine).max() < 1e-9


def test_token_jaccard_np():
    got = token_jaccard_np([["a", "b"], ["a"], None, []], [["b", "c"], ["a"], ["a"], []])
    assert got == pytest.approx([1 / 3, 1.0, 0.0, 0.0])


def test_spark_kernels(spark):
    df = spark.createDataFrame(
        [("martha", "marhta", ["a", "b"], ["b", "c"]), ("kitten", "sitting", ["x"], ["x"])],
        "a string, b string, ta array<string>, tb array<string>",
    )
    out = df.select(
        jw_sim("a", "b").alias("jw"),
        levenshtein_sim("a", "b").alias("lev"),
        token_jaccard("ta", "tb").alias("jac"),
    ).collect()
    assert out[0].jw == pytest.approx(0.9611, abs=5e-4)
    assert out[0].jac == pytest.approx(1 / 3)
    assert out[1].lev == pytest.approx(1 - 3 / 7)
    assert out[1].jac == pytest.approx(1.0)


def test_levenshtein_sim_nulls(spark):
    df = spark.createDataFrame([(None, "x"), ("", ""), ("ab", "ab")], "a string, b string")
    vals = [r.v for r in df.select(levenshtein_sim("a", "b").alias("v")).collect()]
    assert vals == [0.0, 0.0, 1.0]


def test_jw_chunked_and_collapsed_paths():
    """>_JW_CHUNK pairs with heavy duplication exercises the unique-pair
    collapse, the equal-string fast path, AND the chunked matrix path;
    results must match DuckDB's jaro_winkler exactly."""
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    pool = [
        " ".join(
            "".join(rng.choice(list("abcdef"), rng.integers(1, 10)))
            for _ in range(rng.integers(1, 6))
        )
        for _ in range(60)
    ]
    n = 6000
    a = [pool[i] for i in rng.integers(0, 60, n)]
    b = [a[i] if i % 5 == 0 else pool[rng.integers(0, 60)] for i in range(n)]
    df = pd.DataFrame({"a": a, "b": b})
    oracle = (
        duckdb.connect()
        .execute("select jaro_winkler_similarity(a, b) s from df")
        .df()["s"]
        .to_numpy()
    )
    mine = jaro_winkler_np(df.a, df.b)
    assert np.abs(oracle - mine).max() < 1e-9


def test_token_jaccard_sets_matches_generic(spark):
    """token_jaccard_sets on pre-distinct arrays == token_jaccard."""
    from pyspark.sql import functions as F

    from record_linkage_spark.functions.similarity import token_jaccard_sets

    df = spark.createDataFrame(
        [
            (["a", "b", "c"], ["b", "c", "d"]),
            (["x"], ["x"]),
            (["x"], ["y"]),
            ([], []),
            (None, ["a"]),
        ],
        "ta array<string>, tb array<string>",
    )
    out = df.select(
        token_jaccard("ta", "tb").alias("generic"),
        token_jaccard_sets("ta", "tb").alias("sets"),
    ).collect()
    for r in out:
        assert r.generic == pytest.approx(r.sets)


class TestAffineGap:
    def test_golden_values(self):
        from record_linkage_spark.functions.similarity import affine_gap_np

        got = affine_gap_np(
            ["hello", "hello", "abc", "", "kitten", None],
            ["hello", "helo", "xyz", "x", "sitting", "x"],
        )
        assert got[0] == 1.0          # identical
        assert 0.6 < got[1] < 0.8     # one deletion
        assert got[2] < 0.2           # all mismatches
        assert got[3] == 0.0          # empty side
        assert got[5] == 0.0          # null side

    def test_matches_scalar_gotoh(self):
        import random

        import numpy as np

        from record_linkage_spark.config import (
            AFFINE_GAP_EXTEND,
            AFFINE_GAP_OPEN,
            AFFINE_MISMATCH,
        )
        from record_linkage_spark.functions.similarity import affine_gap_np

        def gotoh(s1, s2, mis=AFFINE_MISMATCH, op=AFFINE_GAP_OPEN, ext=AFFINE_GAP_EXTEND):
            l1, l2 = len(s1), len(s2)
            if l1 == 0 or l2 == 0:
                return 0.0
            if s1 == s2:
                return 1.0
            INF = 1e18
            M = [[INF] * (l2 + 1) for _ in range(l1 + 1)]
            X = [[INF] * (l2 + 1) for _ in range(l1 + 1)]
            Y = [[INF] * (l2 + 1) for _ in range(l1 + 1)]
            M[0][0] = 0.0
            for j in range(1, l2 + 1):
                Y[0][j] = op + j * ext
            for i in range(1, l1 + 1):
                X[i][0] = op + i * ext
                for j in range(1, l2 + 1):
                    sub = 0.0 if s1[i - 1] == s2[j - 1] else mis
                    M[i][j] = min(M[i-1][j-1], X[i-1][j-1], Y[i-1][j-1]) + sub
                    X[i][j] = min(min(M[i-1][j], Y[i-1][j]) + op + ext, X[i-1][j] + ext)
                    Y[i][j] = min(min(M[i][j-1], X[i][j-1]) + op + ext, Y[i][j-1] + ext)
            D = min(M[l1][l2], X[l1][l2], Y[l1][l2])
            worst = 2 * op + (l1 + l2) * ext
            return max(0.0, min(1.0, 1 - D / worst))

        rng = random.Random(7)
        alpha = "abcde "
        cases = [("hello", "helo"), ("kitten", "sitting"), ("martha", "marhta")]
        for _ in range(300):
            s1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            s2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            cases.append((s1, s2))
        got = affine_gap_np([c[0] for c in cases], [c[1] for c in cases])
        exp = np.array([gotoh(*c) for c in cases])
        assert np.allclose(got, exp, atol=1e-9)

    def test_spark_udf_matches_kernel(self, spark):
        import numpy as np

        from record_linkage_spark.functions.similarity import (
            affine_gap_np,
            affine_sim,
        )

        rows = [("hello world", "helo world"), ("abc", "abd"), (None, "x"), ("same", "same")]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = [r.s for r in df.select(affine_sim("a", "b").alias("s")).collect()]
        exp = affine_gap_np([r[0] for r in rows], [r[1] for r in rows])
        assert np.allclose(got, exp)


def test_monge_elkan_np_matches_per_token_reference():
    """ME must equal the per-token max/mean reference; word reordering
    keeps ME high where whole-string JW collapses; tokenless sides 0."""
    import numpy as np

    from record_linkage_spark.functions.similarity import (
        jaro_winkler_np,
        monge_elkan_np,
    )

    a = ["acme corp intl", "hello", "", "one two", "john smith"]
    b = ["intl acme corporation", "hello", "x", "", "smith john"]
    ab, ba = monge_elkan_np(a, b)

    def ref(x, y):
        tx, ty = x.split(), y.split()
        if not tx or not ty:
            return 0.0, 0.0
        m = np.array(
            [[jaro_winkler_np([p], [q])[0] for q in ty] for p in tx]
        )
        return m.max(axis=1).mean(), m.max(axis=0).mean()

    for i, (x, y) in enumerate(zip(a, b)):
        w_ab, w_ba = ref(x, y)
        assert ab[i] == pytest.approx(w_ab, abs=1e-12)
        assert ba[i] == pytest.approx(w_ba, abs=1e-12)
    # reordered full-token match is exactly 1.0 both ways
    assert ab[4] == ba[4] == 1.0
    # whole-string JW on the same reordered pair is far lower
    assert jaro_winkler_np(["john smith"], ["smith john"])[0] < 0.75


def test_monge_elkan_pairs_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.functions.similarity import monge_elkan_pairs

    df = spark.createDataFrame(
        [("acme corp", "acme corporation"), ("a b", None)],
        "x string, y string",
    )
    rows = (
        df.withColumn("m", monge_elkan_pairs("x", "y"))
        .select("m.me_ab", "m.me_ba")
        .collect()
    )
    assert rows[0].me_ab > 0.9 and rows[0].me_ba > 0.9
    assert rows[1].me_ab == 0.0 and rows[1].me_ba == 0.0
