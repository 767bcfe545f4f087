"""Golden-record survivorship: rule semantics + deterministic tie-breaks."""

from pyspark.sql import functions as F

from record_linkage_spark.operators.survivorship import golden_records


def _fixture(spark):
    records = spark.createDataFrame(
        [
            # cluster 1: mode(lang)=en, longest text at id 3, ties none
            (1, "aa", "en", "s1", 10),
            (2, "bbbb", "en", "s2", 20),
            (3, "cccccc", "de", "s1", 30),
            # cluster 4: lang tie de/fr -> lexicographically smallest "de";
            # text length tie (4 chars both) -> smallest id 4 wins
            (4, "dddd", "fr", "s3", 5),
            (5, "eeee", "de", "s3", 7),
            # singleton with null lang: lang_canon stays null
            (6, "ff", None, "s9", 1),
        ],
        "id bigint, text string, lang string, source string, n_chars bigint",
    )
    assignment = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "id bigint, entity_id bigint",
    )
    return records, assignment


def test_golden_records_rules(spark):
    records, assignment = _fixture(spark)
    out = golden_records(
        records,
        assignment,
        id_col="id",
        mode_cols=("lang", "source"),
        longest_col="text",
        sum_cols=("n_chars",),
    )
    rows = {r.entity_id: r for r in out.collect()}
    assert set(rows) == {1, 4, 6}

    g1 = rows[1]
    assert g1.n_members == 3
    assert g1.member_ids == "1 2 3"
    assert g1.lang_canon == "en"  # 2-1 majority
    assert g1.source_canon == "s1"  # tie s1/s2 -> smallest value
    assert g1.rep_id == 3 and g1.text_canon == "cccccc"  # longest wins
    assert g1.n_chars_total == 60

    g4 = rows[4]
    assert g4.lang_canon == "de"  # tie de/fr -> smallest value
    assert g4.rep_id == 4 and g4.text_canon == "dddd"  # length tie -> min id
    assert g4.n_chars_total == 12

    g6 = rows[6]
    assert g6.lang_canon is None  # all-null mode col survives as null
    assert g6.source_canon == "s9"
    assert g6.n_members == 1


def test_golden_records_deterministic_across_parallelism(spark):
    records, assignment = _fixture(spark)

    def run(n):
        return sorted(
            golden_records(
                records.repartition(n),
                assignment.repartition(n),
                id_col="id",
                mode_cols=("lang", "source"),
                longest_col="text",
                sum_cols=("n_chars",),
            ).collect()
        )

    assert run(1) == run(13)


def test_golden_records_member_list_off(spark):
    records, assignment = _fixture(spark)
    out = golden_records(
        records, assignment, id_col="id", member_list=False
    )
    assert "member_ids" not in out.columns
    assert {r.entity_id: r.n_members for r in out.collect()} == {
        1: 3,
        4: 2,
        6: 1,
    }


def test_incremental_golden_equals_batch_after_mutations(spark):
    """Insert + in-place update + delete + cluster merge: maintaining the
    golden table over the touched entities must equal a full re-fusion of
    the mutated corpus."""
    from record_linkage_spark.operators.survivorship import (
        golden_records,
        incremental_golden_records,
        touched_entities,
    )

    records0, assignment0 = _fixture(spark)
    rules = dict(
        id_col="id",
        mode_cols=("lang", "source"),
        longest_col="text",
        sum_cols=("n_chars",),
    )
    golden0 = golden_records(records0, assignment0, **rules)

    # mutate: delete record 5, update record 2's text (now longest in
    # cluster 1), insert record 7, and merge singleton 6 into cluster 4
    records1 = (
        records0.where(F.col("id") != 5)
        .where(F.col("id") != 2)
        .unionByName(
            spark.createDataFrame(
                [
                    (2, "bbbbbbbbbb", "en", "s2", 20),  # updated text
                    (7, "gg", "fr", "s3", 9),  # new member of cluster 4
                ],
                records0.schema,
            )
        )
    )
    assignment1 = (
        assignment0.where(~F.col("id").isin(5, 6))
        .unionByName(
            spark.createDataFrame(
                [(6, 4), (7, 4)], "id bigint, entity_id bigint"
            )
        )
    )

    batch = golden_records(records1, assignment1, **rules)

    # content-only update (record 2) isn't visible in the assignment
    # diff: the caller unions its entity in, as documented
    touched = touched_entities(assignment0, assignment1, id_col="id").unionByName(
        assignment1.where(F.col("id") == 2).select("entity_id")
    )
    inc = incremental_golden_records(
        records1, assignment1, golden0, touched, **rules
    )

    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # the update actually changed the fused row (guard non-vacuity)
    g1 = {r.entity_id: r for r in inc.collect()}
    assert g1[1].rep_id == 2 and g1[1].text_canon == "bbbbbbbbbb"
    assert g1[4].n_members == 3  # 4, 6(merged), 7(inserted)
