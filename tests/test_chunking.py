from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.chunking import chunk_documents, chunk_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_windows_and_offsets(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    out = sorted(
        map(
            tuple,
            chunk_documents(
                _docs(spark, [(1, text)]), chunk_tokens=4, stride=3
            ).collect(),
        )
    )
    # starts: 0,3,6,9 — the last a 1-token tail
    assert out == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (1, 3, 9, 1, "t9"),
    ]


def test_every_token_covered_once_per_window_rule(spark):
    text = " ".join(f"w{i}" for i in range(57))
    chunks = chunk_documents(
        _docs(spark, [(7, text)]), chunk_tokens=16, stride=8
    ).collect()
    covered = set()
    for c in chunks:
        covered.update(range(c.start_tok, c.start_tok + c.n_tok))
    assert covered == set(range(57))
    # every non-tail chunk is full-size
    full = [c for c in chunks if c.start_tok + 16 <= 57]
    assert all(c.n_tok == 16 for c in full)


def test_short_null_and_empty_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "only three tokens"), (2, None), (3, "   "), (4, "")]),
        chunk_tokens=8,
        stride=4,
    ).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].n_tok == 3


def test_chunk_stats(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"x{j}" for j in range(20))) for i in range(5)],
    )
    s = chunk_stats(chunk_documents(docs, chunk_tokens=8, stride=8)).first()
    assert s.n_docs == 5
    assert s.n_chunks == 5 * 3  # starts 0, 8, 16
    assert s.chunks_per_doc == 3.0
    assert s.mean_chunk_tokens == pytest.approx((8 + 8 + 4) / 3, abs=1e-6)


def test_validation_and_partitioning_invariance(spark):
    docs = _docs(spark, [(i, " ".join(f"x{j}" for j in range(i + 1))) for i in range(30)])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, stride=9)
    a = sorted(map(tuple, chunk_documents(docs, 8, 4).collect()))
    b = sorted(map(tuple, chunk_documents(docs.repartition(11), 8, 4).collect()))
    assert a == b


def test_plan_is_zero_shuffle(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    plan = (
        chunk_documents(docs, 4, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for tok in ("Python", "Arrow", "InPandas"):
        assert tok not in plan
