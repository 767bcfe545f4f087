"""Schema-matching pins: exact Jaccard against a hand computation,
full score matrix, 1:1 conflict resolution, shared-name namespacing,
and the name-similarity blend."""

import pytest

from pyspark.sql import functions as F

from record_linkage_spark.operators.schema_match import (
    schema_match,
    value_overlap,
)


def _left(spark):
    return spark.createDataFrame(
        [
            ("alice", "nyc", "a@x.com"),
            ("bob", "sf", "b@x.com"),
            ("carol", "nyc", "c@x.com"),
        ],
        "full_name string, city string, email string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("ALICE", "nyc", 1),
            ("dave", "la", 2),
            ("bob", "sf", 3),
        ],
        "name string, town string, uid int",
    )


def test_value_overlap_exact_jaccard(spark):
    ov = {
        (r["lcol"], r["rcol"]): r
        for r in value_overlap(_left(spark), _right(spark)).collect()
    }
    # full matrix: 3 x 3 column pairs, zero-overlap rows included
    assert len(ov) == 9
    nn = ov[("full_name", "name")]
    # lowercased: {alice,bob,carol} vs {alice,dave,bob} -> 2/4
    assert nn["n_inter"] == 2
    assert nn["value_jaccard"] == pytest.approx(0.5)
    ct = ov[("city", "town")]
    # {nyc,sf} vs {nyc,la,sf} -> 2/3
    assert ct["value_jaccard"] == pytest.approx(2 / 3)
    assert ov[("email", "uid")]["n_inter"] == 0


def test_schema_match_picks_one_to_one(spark):
    got = {
        (r["lcol"], r["rcol"]): r["score"]
        for r in schema_match(_left(spark), _right(spark)).collect()
    }
    assert set(got) == {("full_name", "name"), ("city", "town")}


def test_conflicting_column_resolved_by_best_score(spark):
    # both left columns overlap the single right column; only the
    # better one may take it
    left = spark.createDataFrame(
        [("a", "a"), ("b", "x"), ("c", "y")], "c1 string, c2 string"
    )
    right = spark.createDataFrame([("a",), ("b",), ("c",)], "r1 string")
    got = schema_match(left, right, min_score=0.01).collect()
    assert len(got) == 1
    assert (got[0]["lcol"], got[0]["rcol"]) == ("c1", "r1")


def test_shared_column_names_are_namespaced(spark):
    # identical schema on both sides must still match name<->name,
    # not collapse the two 'name' nodes into one
    df = spark.createDataFrame([("a",), ("b",)], "name string")
    got = schema_match(df, df, min_score=0.5).collect()
    assert len(got) == 1
    assert (got[0]["lcol"], got[0]["rcol"]) == ("name", "name")
    assert got[0]["score"] == pytest.approx(1.0)


def test_name_weight_blend_and_validation(spark):
    left = spark.createDataFrame([("zzz",)], "customer_name string")
    right = spark.createDataFrame([("yyy",), ("zzz",)], "customer_nm string")
    pure_val = schema_match(left, right, name_weight=0.0).collect()[0]
    blended = schema_match(left, right, name_weight=0.5).collect()[0]
    assert pure_val["name_sim"] == 0.0
    assert blended["name_sim"] > 0.8  # jw('customer_name','customer_nm')
    assert blended["score"] > pure_val["score"] / 2
    with pytest.raises(ValueError):
        schema_match(left, right, name_weight=1.5)


def test_numeric_columns_compare_as_strings(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "kk bigint")
    ov = value_overlap(left, right).collect()[0]
    assert ov["n_inter"] == 2
    assert ov["value_jaccard"] == pytest.approx(0.5)
