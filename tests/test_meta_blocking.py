"""Meta-blocking: common-blocks weighting, block purging, weight-edge
pruning, node-centric cardinality pruning — hand truth tables."""

from pyspark.sql import functions as F

from record_linkage_spark.operators.blocking import meta_block_prune


def _records(spark):
    # keys: k1 = color, k2 = shape, k3 = size
    return spark.createDataFrame(
        [
            (1, "red", "round", "big"),
            (2, "red", "round", "small"),   # shares k1+k2 with 1 -> w=2
            (3, "red", "square", "big"),    # shares k1+k3 with 1 -> w=2
            (4, "blue", "round", None),     # shares only k2 with 1,2 -> w=1
            (5, "green", "hex", "tiny"),    # shares nothing
        ],
        "doc_id bigint, color string, shape string, size string",
    )


def _keys():
    return {
        "k1": F.col("color"),
        "k2": F.col("shape"),
        "k3": F.col("size"),
    }


def test_weights_and_threshold(spark):
    out = meta_block_prune(
        _records(spark), _keys(), min_shared=1, max_block=50
    ).collect()
    w = {(r.id_A, r.id_B): r.weight for r in out}
    assert w[(1, 2)] == 2  # red + round
    assert w[(1, 3)] == 2  # red + big
    assert w[(2, 3)] == 1  # red only
    assert w[(1, 4)] == 1  # round only
    assert (1, 5) not in w and (4, 5) not in w

    pruned = meta_block_prune(
        _records(spark), _keys(), min_shared=2, max_block=50
    ).collect()
    assert {(r.id_A, r.id_B) for r in pruned} == {(1, 2), (1, 3)}


def test_block_purging_drops_stop_keys(spark):
    # max_block=2 purges red(1,2,3) and round(1,2,4); the only surviving
    # pair-producing bucket is big(1,3), weight 1 < min_shared=2 -> empty
    pruned = meta_block_prune(
        _records(spark), _keys(), min_shared=2, max_block=2
    ).collect()
    assert pruned == []
    # max_block=3 keeps every bucket: same answer as unlimited
    kept = {
        (r.id_A, r.id_B)
        for r in meta_block_prune(
            _records(spark), _keys(), min_shared=2, max_block=3
        ).collect()
    }
    assert kept == {(1, 2), (1, 3)}


def test_null_and_empty_keys_never_post(spark):
    out = meta_block_prune(
        _records(spark),
        {"k3": F.col("size")},
        min_shared=1,
        max_block=50,
    ).collect()
    # only the "big" bucket pairs: (1,3); record 4's null never posts
    assert {(r.id_A, r.id_B) for r in out} == {(1, 3)}


def test_cardinality_pruning_top_k(spark):
    # star: node 1 connects to 2,3 (w=2 each) and 4 (w=1)
    out = meta_block_prune(
        _records(spark), _keys(), min_shared=1, max_block=50, top_k=1
    ).collect()
    kept = {(r.id_A, r.id_B) for r in out}
    # (1,2): rank-1 for node 2 -> kept; (1,3): rank-1 for node 3 -> kept
    # (1,4): rank-1 for node 4 -> kept (either-endpoint rule)
    # (2,3): rank-2 for both 2 and 3 -> dropped
    assert (2, 3) not in kept
    assert {(1, 2), (1, 3), (1, 4)} <= kept


def test_deterministic_across_parallelism(spark):
    def run(n):
        return sorted(
            map(
                tuple,
                meta_block_prune(
                    _records(spark).repartition(n),
                    _keys(),
                    min_shared=1,
                    max_block=50,
                    top_k=1,
                ).collect(),
            )
        )

    assert run(1) == run(7)
