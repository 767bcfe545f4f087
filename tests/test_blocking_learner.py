"""Blocking-key learner: greedy coverage, budget, and stop conditions."""

from pyspark.sql import functions as F

from record_linkage_spark.operators.blocking_learner import learn_blocking_keys


def _fixture(spark):
    # 10 records; positives (1,2) (3,4) (5,6) (7,8)
    # key "city": covers (1,2) (3,4) (5,6)  — broad, cheap-ish
    # key "zip": covers (7,8) only
    # key "country": covers all 4 positives BUT one giant block (everyone
    #   shares it) -> enormous estimated pair cost
    rows = [
        (1, "london", "z1", "uk"),
        (2, "london", "z2", "uk"),
        (3, "paris", "z3", "uk"),
        (4, "paris", "z4", "uk"),
        (5, "berlin", "z5", "uk"),
        (6, "berlin", "z6", "uk"),
        (7, "tokyo", "z7", "uk"),
        (8, "osaka", "z7", "uk"),
        (9, "lima", "z9", "uk"),
        (10, "cairo", "z0", "uk"),
    ]
    records = spark.createDataFrame(
        rows, "doc_id bigint, city string, zip string, country string"
    )
    labeled = spark.createDataFrame(
        [(1, 2, 1), (3, 4, 1), (5, 6, 1), (7, 8, 1), (1, 9, 0), (2, 10, 0)],
        "id_A bigint, id_B bigint, label int",
    )
    keys = {
        "city": F.col("city"),
        "zip": F.col("zip"),
        "country": F.col("country"),
    }
    return records, labeled, keys


def test_greedy_picks_full_coverage_within_budget(spark):
    records, labeled, keys = _fixture(spark)
    # country covers all 4 but costs C(10,2)=45 pairs; budget 10 forces
    # the learner to compose city (3 blocks of 2 -> cost 3) + zip (1
    # block of 2 -> cost 1)
    got = learn_blocking_keys(
        records, labeled, keys, max_pair_budget=10, max_keys=3
    )
    assert got["keys"] == ["city", "zip"]
    assert got["covered"] == 4 and got["positives"] == 4
    assert got["est_pairs"] == 4
    assert got["per_key"]["city"]["gain_at_pick"] == 3
    assert got["per_key"]["zip"]["gain_at_pick"] == 1


def test_unbudgeted_prefers_single_covering_key(spark):
    records, labeled, keys = _fixture(spark)
    got = learn_blocking_keys(records, labeled, keys, max_keys=3)
    # country covers all 4 at once — picked first despite its cost
    assert got["keys"][0] == "country"
    assert got["covered"] == 4
    # nothing left to gain -> no second key
    assert len(got["keys"]) == 1


def test_max_keys_and_min_gain_stop(spark):
    records, labeled, keys = _fixture(spark)
    got = learn_blocking_keys(
        records, labeled, keys, max_pair_budget=10, max_keys=1
    )
    assert got["keys"] == ["city"] and got["covered"] == 3

    got2 = learn_blocking_keys(
        records, labeled, keys, max_pair_budget=10, min_gain=2
    )
    # zip's marginal gain is 1 < 2 -> stops after city
    assert got2["keys"] == ["city"]
