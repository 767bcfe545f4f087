"""End-to-end training-corpus curation plan: the LLM-data analogue of the
linkage pipeline (``plans/pipeline.py``). The reference pipeline stops at
entity resolution (``run_pipeline.py:29-40``); this plan chains the
corpus-curation operators this engine adds on top of it into one
resumable driver program over a ``documents``-shaped table:

  docs -> scrubbed (PII) -> signals (quality/repetition/langid/tokens)
  -> filtered -> dedup (exact + MinHash-LSH near-dup)
  -> decontaminated (benchmark n-gram overlap) -> sampled (per-stratum
  quota) -> packed (sequence bins)  [+ curation_report.json]

Every stage is a checkpointed warehouse table with a lineage sidecar
(config-hash resume, per-file row counts from parquet footers), so the
funnel report costs ZERO extra Spark jobs — stage row counts come from
lineage, not ``count()``. At 100 TB each arrow above is one bounded
shuffle or a pure map (see the per-operator scale notes in
``operators/curation.py`` / ``operators/dedup.py``); nothing in the
plan itself adds a driver-side loop or collect.

Run:  python -m record_linkage_spark.plans.curate --warehouse /tmp/cwh \
        --sf-dir /root/testdata/sf0.01 [--quota 200] [--pack-budget 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from record_linkage_spark.config import RANDOM_SEED
from record_linkage_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_features,
    scrub_pii,
    stratified_quota_sample,
)
from record_linkage_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    set_similarity_pairs,
)
from record_linkage_spark.operators.text_analysis import (
    language_id,
    quality_features,
    token_count_ws,
)
from record_linkage_spark.sources.checkpoints import Warehouse

STAGES = [
    "docs",
    "scrubbed",
    "signals",
    "filtered",
    "deduped",
    "decontaminated",
    "sampled",
    "packed",
]


def signals_table(scrubbed: DataFrame) -> DataFrame:
    """Quality + language + token-count + repetition signals per doc —
    one explode+agg (repetition) left-joined onto pure map columns."""
    q = (
        quality_features(scrubbed)
        .withColumn("lang", language_id(F.col("text")))
        .withColumn("n_tokens", token_count_ws(F.col("text")))
    )
    rep = repetition_features(scrubbed).select(
        "doc_id", "dup_token_frac", "top_token_frac", "dup_line_frac"
    )
    return q.join(rep, "doc_id", "left").fillna(
        0.0, ["dup_token_frac", "top_token_frac", "dup_line_frac"]
    )


def apply_quality_filter(
    signals: DataFrame,
    min_quality: float = 0.4,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_top_token_frac: float = 0.30,
    max_dup_line_frac: float = 0.50,
) -> DataFrame:
    return signals.filter(
        (F.col("q_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )


def _near_dup_pairs(
    docs: DataFrame, threshold: float, pair_strategy: str
) -> DataFrame:
    """Near-dup pair generation for the funnel, selectable:

    ``minhash`` (default): MinHash-LSH over 3-gram shingles — the
    probabilistic 100 TB path (banded bucket join, tunable recall).
    ``ssjoin``: prefix-filter set-similarity join over TOKEN sets —
    exact, guaranteed recall at the threshold (the two paths score
    different set families, shingles vs tokens, so thresholds are not
    numerically interchangeable; both are Jaccard in [0, 1])."""
    if pair_strategy == "ssjoin":
        return set_similarity_pairs(docs, threshold=threshold).select(
            "id_A", "id_B"
        )
    if pair_strategy == "minhash":
        return minhash_near_duplicates(docs, jaccard_threshold=threshold).select(
            "id_A", "id_B"
        )
    raise ValueError(f"unknown pair_strategy: {pair_strategy}")


def dedup_corpus(
    filtered: DataFrame,
    minhash_threshold: float = 0.8,
    pair_strategy: str = "minhash",
) -> DataFrame:
    """Exact (md5 groupBy) then MinHash-LSH near-dup removal. Drop
    policy: a doc goes iff ANY smaller-id doc (kept or itself dropped)
    duplicates it — pairs are canonical id_A < id_B and the drop set is
    distinct(id_B) ∪ exploded dup_ids. In a non-transitive chain
    (a~b, b~c, a!~c below threshold < 1.0) c is therefore dropped even
    though its only smaller-id duplicate b was dropped too: the policy
    trades a little over-removal for a single-pass plan (the
    keep-one-representative-per-component alternative is
    :func:`dedup_corpus_keep_best`, selectable in the funnel with
    ``dedup_policy="keep_best"``). At threshold 1.0 duplication is
    transitive and the two
    policies coincide. Both removals are left_anti joins on doc_id (the
    drop side is the small one, the payload never reshuffles)."""
    exact_drop = (
        exact_duplicates(filtered)
        .select(F.explode("dup_ids").alias("doc_id"))
        .distinct()
    )
    after_exact = filtered.join(exact_drop, "doc_id", "left_anti")
    near_drop = (
        _near_dup_pairs(after_exact, minhash_threshold, pair_strategy)
        .select(F.col("id_B").alias("doc_id"))
        .distinct()
    )
    return after_exact.join(near_drop, "doc_id", "left_anti")


def dedup_corpus_keep_best(
    filtered: DataFrame,
    minhash_threshold: float = 0.8,
    order_col: str = "q_score",
    pair_strategy: str = "minhash",
) -> DataFrame:
    """Keep-one-representative-per-component dedup — the alternative
    policy :func:`dedup_corpus` documents: exact-dup edges (md5 group
    keep_id -> dup_ids) union MinHash-LSH near-dup edges feed connected
    components, and the highest-``order_col`` doc (doc_id tiebreak)
    survives per component. In the non-transitive chain a~b, b~c the
    drop-list policy removes both b and c; this one keeps exactly the
    best of {a, b, c}. Costs one CC loop over the pair graph (edge-set
    sized, tiny next to the corpus) on top of the drop-list plan.

    Near-dup pairs are generated on the exact-collapsed set — lossless
    for the component structure because byte-identical normalized text
    has identical shingles, so every exact-dup member reaches its
    group's near-dup links through the keep_id edge."""
    from record_linkage_spark.operators.curation import keep_best_per_cluster

    ex = exact_duplicates(filtered)
    exact_edges = ex.select(
        F.col("keep_id").alias("src"), F.explode("dup_ids").alias("dst")
    )
    exact_drop = ex.select(F.explode("dup_ids").alias("doc_id")).distinct()
    after_exact = filtered.join(exact_drop, "doc_id", "left_anti")
    near_edges = _near_dup_pairs(
        after_exact, minhash_threshold, pair_strategy
    ).select(F.col("id_A").alias("src"), F.col("id_B").alias("dst"))
    kept = keep_best_per_cluster(
        filtered,
        exact_edges.unionByName(near_edges),
        [F.col(order_col).desc()],
        id_col="doc_id",
    )
    return kept.drop("entity_id", "n_cluster")


def remove_contaminated(
    deduped: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    min_shared_grams: int = 1,
) -> DataFrame:
    flagged = decontaminate(deduped, benchmark, ngram=ngram).filter(
        F.col("n_shared_grams") >= min_shared_grams
    )
    return deduped.join(flagged.select("doc_id"), "doc_id", "left_anti")


class CurationPipeline:
    """Configurable curation funnel. Thresholds default to the Gopher-ish
    heuristics the signal operators document; every knob lands in each
    stage's config hash, so changing one re-runs only the stages below it.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        docs_df: DataFrame | None = None,
        sf_dir: str | None = None,
        benchmark_df: DataFrame | None = None,
        min_quality: float = 0.4,
        min_tokens: int = 5,
        max_tokens: int = 100_000,
        max_top_token_frac: float = 0.30,
        max_dup_line_frac: float = 0.50,
        minhash_threshold: float = 0.8,
        dedup_policy: str = "droplist",
        pair_strategy: str = "minhash",
        decontam_ngram: int = 8,
        min_shared_grams: int = 1,
        strata_cols: tuple[str, ...] = ("lang",),
        quota: int = 1_000,
        pack_budget: int = 2_048,
        rule_filters: tuple[str, ...] = (),
        c4_kwargs: dict | None = None,
        gopher_kwargs: dict | None = None,
        zratio_kwargs: dict | None = None,
    ):
        self.spark = spark
        self.wh = Warehouse(root=warehouse, spark=spark)
        self._docs_df = docs_df
        self.sf_dir = sf_dir
        self._benchmark_df = benchmark_df
        self.min_quality = min_quality
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.max_top_token_frac = max_top_token_frac
        self.max_dup_line_frac = max_dup_line_frac
        self.minhash_threshold = minhash_threshold
        if dedup_policy not in ("droplist", "keep_best"):
            raise ValueError(f"unknown dedup_policy: {dedup_policy}")
        self.dedup_policy = dedup_policy
        if pair_strategy not in ("minhash", "ssjoin"):
            raise ValueError(f"unknown pair_strategy: {pair_strategy}")
        self.pair_strategy = pair_strategy
        self.decontam_ngram = decontam_ngram
        self.min_shared_grams = min_shared_grams
        self.strata_cols = list(strata_cols)
        self.quota = quota
        self.pack_budget = pack_budget
        bad = set(rule_filters) - {"c4", "gopher", "zratio"}
        if bad:
            raise ValueError(f"unknown rule_filters: {sorted(bad)}")
        self.rule_filters = tuple(rule_filters)
        self.c4_kwargs = dict(c4_kwargs or {})
        self.gopher_kwargs = dict(gopher_kwargs or {})
        self.zratio_kwargs = dict(zratio_kwargs or {})
        self.report: dict = {}

    def _cfg(self, **kw) -> dict:
        return {"seed": RANDOM_SEED, "sf_dir": self.sf_dir, **kw}

    def _load_docs(self) -> DataFrame:
        if self._docs_df is not None:
            return self._docs_df.select("doc_id", "text")
        return self.spark.read.parquet(
            os.path.join(self.sf_dir, "documents.parquet")
        ).select("doc_id", "text")

    benchmark_path: str | None = None  # optional parquet of benchmark docs

    def _benchmark(self, docs: DataFrame) -> DataFrame:
        """Benchmark suite to decontaminate against: an explicit frame, a
        parquet path (``benchmark_path`` / CLI --benchmark-parquet), or —
        failing both — a deterministic hash-slice of the corpus (it is
        guaranteed to overlap, which exercises the removal path)."""
        if self._benchmark_df is not None:
            return self._benchmark_df.select("doc_id", "text")
        if self.benchmark_path:
            return self.spark.read.parquet(self.benchmark_path).select(
                "doc_id", "text"
            )
        return docs.filter(F.pmod(F.xxhash64(F.lit(13), "doc_id"), 97) == 0)

    def run(self, resume: bool = True) -> dict:
        wh = self.wh
        os.makedirs(wh.root, exist_ok=True)

        docs = wh.run_stage("docs", self._load_docs, self._cfg(), resume=resume)

        scrubbed = wh.run_stage(
            "scrubbed",
            lambda: docs.select(
                "doc_id", scrub_pii("text").alias("text")
            ).filter(F.col("text").isNotNull()),
            self._cfg(),
            inputs=["docs"],
            resume=resume,
        )

        # optional classic rule cascade between scrub and the statistical
        # signals: C4 (line filter rewrites the text, then doc rules) and
        # Gopher (doc rules only) in that order. Off by default — the
        # stage graph and every downstream config hash are byte-identical
        # to the pre-flag pipeline when rule_filters is empty.
        signals_src, signals_input = scrubbed, "scrubbed"
        if self.rule_filters:
            from record_linkage_spark.operators.web_filters import (
                c4_filters,
                compression_ratio_filter,
                gopher_filters,
            )

            def _rules() -> DataFrame:
                out = scrubbed
                if "c4" in self.rule_filters:
                    out = (
                        c4_filters(out, **self.c4_kwargs)
                        .filter("keep")
                        .select("doc_id", F.col("kept_text").alias("text"))
                    )
                if "gopher" in self.rule_filters:
                    out = (
                        gopher_filters(out, **self.gopher_kwargs)
                        .filter("keep")
                        .select("doc_id", "text")
                    )
                if "zratio" in self.rule_filters:
                    out = (
                        compression_ratio_filter(out, **self.zratio_kwargs)
                        .filter("keep")
                        .select("doc_id", "text")
                    )
                return out

            signals_src = wh.run_stage(
                "rule_filtered",
                _rules,
                self._cfg(
                    rules=list(self.rule_filters),
                    c4=sorted(self.c4_kwargs.items()),
                    gopher=sorted(self.gopher_kwargs.items()),
                    zratio=sorted(self.zratio_kwargs.items()),
                ),
                inputs=["scrubbed"],
                resume=resume,
            )
            signals_input = "rule_filtered"

        signals = wh.run_stage(
            "signals",
            lambda: signals_table(signals_src),
            # src in the config hash: resume keys on cfg alone, so the
            # stage must re-run when the rule-filter flag flips its input
            self._cfg(src=signals_input),
            inputs=[signals_input],
            resume=resume,
        )

        filt_cfg = self._cfg(
            min_quality=self.min_quality,
            min_tokens=self.min_tokens,
            max_tokens=self.max_tokens,
            max_top_token_frac=self.max_top_token_frac,
            max_dup_line_frac=self.max_dup_line_frac,
        )
        filtered = wh.run_stage(
            "filtered",
            lambda: apply_quality_filter(
                signals,
                min_quality=self.min_quality,
                min_tokens=self.min_tokens,
                max_tokens=self.max_tokens,
                max_top_token_frac=self.max_top_token_frac,
                max_dup_line_frac=self.max_dup_line_frac,
            ),
            filt_cfg,
            inputs=["signals"],
            resume=resume,
        )

        dedup_fn = (
            dedup_corpus_keep_best
            if self.dedup_policy == "keep_best"
            else dedup_corpus
        )
        deduped = wh.run_stage(
            "deduped",
            lambda: dedup_fn(
                filtered,
                self.minhash_threshold,
                pair_strategy=self.pair_strategy,
            ),
            self._cfg(
                minhash_threshold=self.minhash_threshold,
                policy=self.dedup_policy,
                pair_strategy=self.pair_strategy,
            ),
            inputs=["filtered"],
            resume=resume,
        )

        decontaminated = wh.run_stage(
            "decontaminated",
            lambda: remove_contaminated(
                deduped,
                self._benchmark(docs),
                ngram=self.decontam_ngram,
                min_shared_grams=self.min_shared_grams,
            ),
            self._cfg(
                ngram=self.decontam_ngram,
                min_shared=self.min_shared_grams,
                benchmark=self.benchmark_path,
            ),
            inputs=["deduped", "docs"],
            resume=resume,
        )

        sampled = wh.run_stage(
            "sampled",
            lambda: stratified_quota_sample(
                decontaminated, self.strata_cols, self.quota, "doc_id"
            ),
            self._cfg(quota=self.quota, strata=self.strata_cols),
            inputs=["decontaminated"],
            resume=resume,
        )

        packed = wh.run_stage(
            "packed",
            lambda: pack_sequences(sampled, self.pack_budget),
            self._cfg(budget=self.pack_budget),
            inputs=["sampled"],
            resume=resume,
        )

        # corpus length profile (approx_percentile — the mergeable-sketch
        # production path; bounded memory at any corpus size): the summary
        # an operator reads before tuning the min/max-token cutoffs above
        from record_linkage_spark.operators.text_analysis import length_quantiles

        lq = {
            f"p{int(r.p * 100)}": r.n_chars_q
            for r in length_quantiles(scrubbed, exact=False).collect()
        }

        # input-vs-output distribution drift: did curation shift the
        # corpus beyond the intended removals? One bins-bounded pass over
        # each of the two stage tables (operators/drift.py) — the report
        # cost is features x bins rows regardless of corpus size
        from record_linkage_spark.operators.drift import (
            HistSpec,
            drift_report,
            drift_scalars,
        )

        drift_specs = [
            HistSpec("n_chars", "n_chars", (50, 100, 200, 400, 800))
        ]
        drift = {
            r.feature: {"psi": r.psi, "jsd": r.jsd, "tv": r.tv}
            for r in drift_scalars(
                drift_report(
                    docs.withColumn("n_chars", F.length("text")),
                    sampled.withColumn("n_chars", F.length("text")),
                    drift_specs,
                )
            ).collect()
        }

        # funnel report from lineage row counts — zero extra Spark jobs
        stages = list(STAGES)
        if self.rule_filters:
            stages.insert(stages.index("signals"), "rule_filtered")
        counts = {
            s: (wh.lineage(s) or {}).get("row_count") for s in stages
        }
        n0 = counts.get("docs") or 0
        self.report = {
            "stages": counts,
            "length_quantiles_chars": lq,
            # per-stage write times from lineage (resumed stages carry the
            # ORIGINAL run's time, so a resume run reports honest costs)
            "stage_seconds": {
                s: (wh.lineage(s) or {}).get("write_seconds") for s in stages
            },
            "removed": {
                "scrub_null": _delta(counts, "docs", "scrubbed"),
                **(
                    {"rule_filters": _delta(counts, "scrubbed", "rule_filtered")}
                    if self.rule_filters
                    else {}
                ),
                "quality_filter": _delta(counts, "signals", "filtered"),
                "dedup": _delta(counts, "filtered", "deduped"),
                "decontamination": _delta(counts, "deduped", "decontaminated"),
                "sampling": _delta(counts, "decontaminated", "sampled"),
            },
            "kept_frac": round(counts.get("sampled", 0) / n0, 6) if n0 else None,
            "drift_vs_input": drift,
            # ceil(total_tokens / budget): a doc straddling the last cut
            # still opens the next bin
            "n_bins": (
                packed.agg(
                    F.ceil(
                        F.sum("n_tokens") / F.lit(float(self.pack_budget))
                    ).cast("long").alias("b")
                ).first().b
            ),
            "pack_budget": self.pack_budget,
            "config": {
                "rule_filters": list(self.rule_filters),
                "min_quality": self.min_quality,
                "minhash_threshold": self.minhash_threshold,
                "dedup_policy": self.dedup_policy,
                "pair_strategy": self.pair_strategy,
                "decontam_ngram": self.decontam_ngram,
                "quota": self.quota,
                "strata": self.strata_cols,
            },
        }
        with open(os.path.join(wh.root, "curation_report.json"), "w") as f:
            json.dump(self.report, f, indent=2)
        return self.report


def _delta(counts: dict, before: str, after: str) -> int | None:
    a, b = counts.get(before), counts.get(after)
    return (a - b) if a is not None and b is not None else None


def apply_drift_gate(pipe: "CurationPipeline", max_drift: float) -> dict:
    """Release gate on the report's ``drift_vs_input`` block: any
    monitored feature whose PSI exceeds ``max_drift`` (0.25 is the
    documented significant-shift threshold — ``operators/drift.py``)
    marks the run FAILED. The verdict is appended to
    ``curation_report.json`` AND noted in the final stage table's
    lineage sidecar, so a resumed or audited run sees that its sampled
    corpus was produced by a gate-breaching curation. Returns the gate
    dict; the CLI exits non-zero on breach."""
    drift = (pipe.report or {}).get("drift_vs_input", {})
    breaches = {
        f: m
        for f, m in drift.items()
        if m.get("psi") is not None and m["psi"] > max_drift
    }
    gate = {
        "metric": "psi",
        "max_drift": max_drift,
        "breaches": breaches,
        "passed": not breaches,
    }
    pipe.report["drift_gate"] = gate
    with open(os.path.join(pipe.wh.root, "curation_report.json"), "w") as f:
        json.dump(pipe.report, f, indent=2)
    # lineage note on the terminal stage (the released corpus)
    lin_path = pipe.wh.lineage_path("sampled")
    lin = pipe.wh.lineage("sampled")
    if lin is not None:
        lin["drift_gate"] = gate
        with open(lin_path, "w") as f:
            json.dump(lin, f, indent=2)
    return gate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--quota", type=int, default=1000)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument(
        "--dedup-policy",
        choices=("droplist", "keep_best"),
        default="droplist",
        help="droplist: single-pass drop of any doc duplicating a smaller "
        "id; keep_best: one best-quality representative per CC component",
    )
    ap.add_argument(
        "--pair-strategy",
        choices=("minhash", "ssjoin"),
        default="minhash",
        help="near-dup pair generator: minhash = LSH over 3-gram shingles "
        "(probabilistic); ssjoin = prefix-filter set-similarity join over "
        "token sets (exact, guaranteed recall at the threshold)",
    )
    ap.add_argument(
        "--benchmark-parquet",
        default=None,
        help="parquet of (doc_id, text) benchmark docs to decontaminate against",
    )
    ap.add_argument(
        "--rule-filters",
        default="",
        help="comma list of classic rule cascades to run between scrub and "
        "signals: c4 (line filter + doc rules, rewrites text), "
        "gopher (statistical doc rules), and/or zratio "
        "(zlib compression-ratio repetition proxy)",
    )
    ap.add_argument(
        "--rule-kwargs",
        default="{}",
        help='JSON overriding rule thresholds, e.g. \'{"gopher": '
        '{"min_words": 20, "min_stop_words": 1}, "c4": '
        '{"min_sentences": 3}}\'',
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--max-drift",
        type=float,
        default=None,
        help="fail the run (exit 2, lineage note) when any monitored "
        "feature's input-vs-output PSI exceeds this; 0.25 is the "
        "documented significant-shift threshold (operators/drift.py)",
    )
    args = ap.parse_args()

    from record_linkage_spark.session import get_spark

    spark = get_spark("curate")
    pipe = CurationPipeline(
        spark,
        args.warehouse,
        sf_dir=args.sf_dir,
        quota=args.quota,
        pack_budget=args.pack_budget,
        minhash_threshold=args.minhash_threshold,
        dedup_policy=args.dedup_policy,
        pair_strategy=args.pair_strategy,
        rule_filters=tuple(
            s for s in args.rule_filters.split(",") if s
        ),
        c4_kwargs=json.loads(args.rule_kwargs).get("c4"),
        gopher_kwargs=json.loads(args.rule_kwargs).get("gopher"),
        zratio_kwargs=json.loads(args.rule_kwargs).get("zratio"),
    )
    pipe.benchmark_path = args.benchmark_parquet
    report = pipe.run(resume=not args.no_resume)
    if args.max_drift is not None:
        gate = apply_drift_gate(pipe, args.max_drift)
        print(json.dumps(report, indent=2))
        if not gate["passed"]:
            print(
                f"DRIFT GATE FAILED: {sorted(gate['breaches'])} exceed "
                f"psi {args.max_drift}",
                file=sys.stderr,
            )
            sys.exit(2)
    else:
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
