"""Property-based tests (hypothesis) for the driver-side kernels —
no SparkSession needed, so these are fast and run wide input spaces."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from record_linkage_spark.functions.similarity import (
    jaro_winkler_np,
    token_jaccard_np,
)

ascii_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ", min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(ascii_text, ascii_text), min_size=1, max_size=50))
def test_jw_matches_duckdb_on_arbitrary_ascii(pairs):
    df = pd.DataFrame(pairs, columns=["a", "b"])
    oracle = (
        duckdb.connect()
        .execute("select jaro_winkler_similarity(a, b) s from df")
        .df()["s"]
        .to_numpy()
    )
    mine = jaro_winkler_np(df.a, df.b)
    assert np.abs(oracle - mine).max() < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.tuples(ascii_text, ascii_text))
def test_jw_bounds_symmetric_identity(pair):
    a, b = pair
    ab = float(jaro_winkler_np([a], [b])[0])
    ba = float(jaro_winkler_np([b], [a])[0])
    assert 0.0 <= ab <= 1.0
    assert abs(ab - ba) < 1e-12  # symmetric
    if a:
        assert float(jaro_winkler_np([a], [a])[0]) == 1.0  # identity
    else:
        assert float(jaro_winkler_np([a], [a])[0]) == 0.0  # empty rule


token = st.text(alphabet="abcdef", min_size=1, max_size=6)


@settings(max_examples=100, deadline=None)
@given(st.lists(token, max_size=20), st.lists(token, max_size=20))
def test_token_jaccard_properties(ta, tb):
    j = float(token_jaccard_np([ta], [tb])[0])
    assert 0.0 <= j <= 1.0
    assert j == float(token_jaccard_np([tb], [ta])[0])  # symmetric
    if set(ta) and set(ta) == set(tb):
        assert j == 1.0
    if not (set(ta) & set(tb)):
        assert j == 0.0
