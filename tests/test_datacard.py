from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.plans.datacard import build_datacard


@pytest.fixture(scope="module")
def corpus(spark):
    prose_lines = [
        "The quick brown fox jumps over the lazy dog near the river bank.",
        "It was a calm and quiet morning in the small village by the sea.",
        "People walked slowly to the market while birds sang in the trees.",
        "Every sentence here ends with proper punctuation as it should.",
        "This paragraph continues long enough to pass minimum word rules.",
    ] * 3
    rows = []
    for i in range(40):
        doc = "\n".join([f"This is numbered variant {i} of the corpus."] + prose_lines)
        rows.append((i, doc, "en"))
    rows.append((100, rows[0][1], "en"))      # exact dup of doc 0
    rows.append((101, rows[1][1], "en"))      # exact dup of doc 1
    rows.append((102, "short", "de"))          # fails quality rules
    rows.append((103, None, None))             # empty/null doc
    rows.append(
        (104, "\n".join(prose_lines) + "\nmail me at bob@example.com.", "en")
    )  # PII
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_datacard_sections_and_values(corpus):
    card = build_datacard(corpus, name="unit")
    assert card["name"] == "unit"
    v = card["volume"]
    assert v["n_docs"] == 45
    assert v["n_empty"] == 1
    assert v["n_tokens_ws"] > 0
    # languages: en dominates, null sentinel present
    assert card["languages"]["en"] == pytest.approx(43 / 45, abs=1e-6)
    assert "__null__" in card["languages"]
    # duplication: two planted exact dups
    assert card["duplication"]["exact_dup_docs"] == 2
    assert card["duplication"]["exact_dup_frac"] == pytest.approx(2 / 45, abs=1e-6)
    # below k the KMV estimate is exact: distinct non-null texts
    n_distinct = (
        corpus.filter(F.col("text").isNotNull()).select("text").distinct().count()
    )
    assert card["duplication"]["distinct_text_est"] == float(n_distinct)
    # PII: exactly the planted email doc
    assert card["pii"]["docs_with_pii"] == 1
    # quality rates in (0, 1] — the short doc fails, prose passes
    assert 0 < card["quality"]["c4_pass_rate"] <= 1
    assert 0 < card["quality"]["gopher_pass_rate"] <= 1
    # length quantiles ordered
    lq = card["length_chars"]
    assert lq["p50"] <= lq["p90"] <= lq["p99"]


def test_datacard_drift_section(corpus):
    baseline = corpus.filter(F.col("doc_id") < 20)
    card = build_datacard(corpus, baseline=baseline)
    d = card["drift_vs_baseline"]
    assert set(d) == {"n_chars", "lang"}
    for f in d.values():
        assert f["psi"] >= 0.0


def test_datacard_deterministic(corpus):
    a = build_datacard(corpus)
    b = build_datacard(corpus.repartition(7))
    assert a == b
