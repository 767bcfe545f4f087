"""Data card ("datasheet") generator: one call that composes the
engine's profiling operators into the JSON summary a dataset release
ships with — volume, language mix, length distribution, quality-rule
pass rates, duplication, PII surface, and (optionally) drift against a
baseline snapshot.

Why this is a plan, not an operator: every section below is an existing
oracle- or test-pinned operator (sketches, web filters, dedup, drift,
PII scrub); the card is the glue that runs each at its bounded cost and
assembles the numbers. Cost discipline: the corpus is scanned a small
constant number of times (volume+quality fuse into one pass; dedup is
the one hash groupBy; the length profile is the mergeable histogram
sketch; distinct-text estimation is the bounded-state KMV sketch), and
nothing collects more than section-sized frames to the driver — the
same report runs at 100 TB with the same driver memory.

Reference (public): Gebru et al., "Datasheets for Datasets" (CACM
2021) motivates the artifact; the sections mirror what the curation
CLI's funnel report already tracks per-run, aggregated here per-corpus.
Reference-repo parity: the reference has no dataset-documentation
surface; this extends the engine's A-series corpus statistics.

CLI::

    python -m record_linkage_spark.plans.datacard \
        --sf-dir /root/testdata/sf0.01 --out /tmp/datacard.json
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_datacard(
    docs: DataFrame,
    name: str = "corpus",
    baseline: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    top_langs: int = 10,
) -> dict:
    """Assemble the data card dict for ``docs`` (``(id, text[, lang])``
    rows). ``baseline`` (optional) adds a drift section against a prior
    snapshot of the same shape."""
    from record_linkage_spark.operators.curation import scrub_pii
    from record_linkage_spark.operators.dedup import exact_duplicates
    from record_linkage_spark.operators.sketches import (
        histogram_quantiles,
        int_histogram,
        kmv_estimate,
        kmv_sketch,
    )
    from record_linkage_spark.operators.text_analysis import token_count_ws
    from record_linkage_spark.operators.web_filters import (
        c4_filters,
        gopher_filters,
    )

    t = F.col(text_col)

    # -- volume + PII surface: ONE pass (all plain aggregates) ----------
    vol = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(t.isNull() | (F.trim(t) == ""), 1).otherwise(0)).alias(
            "n_empty"
        ),
        F.sum(F.length(t)).alias("n_chars"),
        F.sum(token_count_ws(t).cast("long")).alias("n_tokens_ws"),
        # a doc has PII iff the scrubber would change it
        F.sum(
            F.when(scrub_pii(t) != t, 1).otherwise(0)
        ).alias("n_docs_with_pii"),
    ).first()
    n_docs = int(vol.n_docs or 0)

    # -- language mix (bounded by the lang domain) ----------------------
    langs = {}
    if lang_col is not None and lang_col in docs.columns:
        lang_rows = (
            docs.groupBy(F.coalesce(F.col(lang_col), F.lit("__null__")).alias("lang"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "lang")
            .limit(top_langs)
            .collect()
        )
        langs = {
            r.lang: round(r.n / n_docs, 6) if n_docs else 0.0 for r in lang_rows
        }

    # -- length distribution: the mergeable histogram sketch ------------
    hist = int_histogram(
        docs.select(F.length(t).cast("long").alias("_v")), "_v", precision=7
    )
    lq = {
        f"p{int(r.q * 100)}": int(r.v_est)
        for r in histogram_quantiles(
            hist, [0.5, 0.9, 0.99], precision=7
        ).collect()
    }

    # -- quality-rule pass rates: one fused pass per rule family --------
    c4_rate = (
        c4_filters(docs, text_col=text_col)
        .agg(F.avg(F.col("keep").cast("double")).alias("r"))
        .first()
        .r
    )
    gopher_rate = (
        gopher_filters(docs, text_col=text_col)
        .agg(F.avg(F.col("keep").cast("double")).alias("r"))
        .first()
        .r
    )

    # -- duplication: exact-dup mass + KMV distinct-text estimate -------
    dup_docs = (
        exact_duplicates(docs, id_col=id_col, text_col=text_col)
        .agg(F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0)).alias("d"))
        .first()
        .d
    )
    distinct_est = kmv_estimate(
        kmv_sketch(docs.select(t.alias("_t")), "_t", k=1024), k=1024
    ).first()

    card = {
        "name": name,
        "volume": {
            "n_docs": n_docs,
            "n_empty": int(vol.n_empty or 0),
            "n_chars": int(vol.n_chars or 0),
            "n_tokens_ws": int(vol.n_tokens_ws or 0),
        },
        "languages": langs,
        "length_chars": lq,
        "quality": {
            "c4_pass_rate": round(float(c4_rate or 0.0), 6),
            "gopher_pass_rate": round(float(gopher_rate or 0.0), 6),
        },
        "duplication": {
            "exact_dup_docs": int(dup_docs),
            "exact_dup_frac": round(dup_docs / n_docs, 6) if n_docs else 0.0,
            "distinct_text_est": float(distinct_est.est_distinct),
        },
        "pii": {
            "docs_with_pii": int(vol.n_docs_with_pii or 0),
            "pii_doc_frac": (
                round((vol.n_docs_with_pii or 0) / n_docs, 6) if n_docs else 0.0
            ),
        },
    }

    if baseline is not None:
        from record_linkage_spark.operators.drift import corpus_drift

        a = baseline.withColumn("n_chars", F.length(text_col))
        b = docs.withColumn("n_chars", F.length(text_col))
        card["drift_vs_baseline"] = {
            r.feature: {"psi": r.psi, "jsd": r.jsd, "tv": r.tv}
            for r in corpus_drift(a, b).collect()
        }
    return card


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--name", default="documents")
    args = ap.parse_args()

    from record_linkage_spark.session import get_spark

    spark = get_spark("datacard")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    card = build_datacard(docs, name=args.name)
    out = json.dumps(card, indent=2, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
