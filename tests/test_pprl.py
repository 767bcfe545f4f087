"""PPRL CLK Bloom encodings: encoding semantics vs a pure-python
reference, Dice-approximates-cleartext-Dice, banded blocking recall on
typo'd duplicates, and the privacy property that only positions leave
the encoder."""

import hashlib

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.pprl import (
    clk_band_keys,
    clk_candidate_pairs,
    clk_encode,
    dice_pairs,
)

SCHEMA = "record_id bigint, first string, last string, city string"
ROWS = [
    (1, "John", "Smith", "Boston"),
    (2, "Jon", "Smith", "Boston"),       # typo'd dup of 1
    (3, "Johanna", "Smithers", "Austin"),
    (4, "Mary", "Jones", "Denver"),
    (5, "mary ", "JONES", "denver"),     # case/space dup of 4
    (6, None, "", "  "),                  # empty record
]
FIELDS = ["first", "last", "city"]


def _ref_clk(row, m=512, k=4, q=2):
    """Pure-python mirror of the portable encoding."""
    bits = set()
    for f, v in zip(FIELDS, row):
        v = (v or "").strip().lower()
        if not v:
            continue
        padded = f"_{v}_"
        grams = {padded[i : i + q] for i in range(len(padded) - q + 1)}
        for g in grams:
            tagged = f"{f}\x01{g}"
            for i in range(1, k + 1):
                h = hashlib.md5(f"{i}\x01{tagged}".encode()).hexdigest()
                bits.add(int(h[:15], 16) % m)
    return sorted(bits)


def _enc(spark, portable=True):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return clk_encode(df, FIELDS, m=512, k=4, portable=portable)


def test_encoding_matches_python_reference(spark):
    got = {r.record_id: list(r.clk) for r in _enc(spark).collect()}
    for rid, first, last, city in ROWS:
        assert got[rid] == _ref_clk((first, last, city)), rid
    assert got[6] == []


def test_dice_separates_dups_from_nonmatches(spark):
    enc = _enc(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5), (1, 3), (1, 4), (6, 6)], "id_A bigint, id_B bigint"
    )
    d = {(r.id_A, r.id_B): r.dice for r in dice_pairs(pairs, enc).collect()}
    assert d[(4, 5)] == pytest.approx(1.0)  # normalization erases the mess
    assert d[(1, 2)] > 0.7                  # one-char typo stays high
    assert d[(1, 3)] < d[(1, 2)]            # related-but-different lower
    assert d[(1, 4)] < 0.2                  # unrelated low
    assert d[(6, 6)] == 0.0                 # empty filters -> 0, not NaN


def test_banded_blocking_recovers_typo_dup(spark):
    enc = _enc(spark)
    cands = {
        (r.id_A, r.id_B) for r in clk_candidate_pairs(enc, n_bands=8).collect()
    }
    assert (1, 2) in cands and (4, 5) in cands
    assert (1, 4) not in cands  # unrelated records share no band pattern
    # empty record generates no candidates (empty patterns dropped)
    assert all(6 not in p for p in cands)


def test_band_keys_cover_all_bands_and_only_positions_leave(spark):
    enc = _enc(spark)
    keys = clk_band_keys(enc, n_bands=8).collect()
    per_record = {}
    for r in keys:
        per_record.setdefault(r.record_id, []).append(r.band)
    assert all(sorted(v) == list(range(8)) for v in per_record.values())
    # privacy surface: encoding output carries ONLY integer positions
    enc_cols = dict(enc.dtypes)
    assert enc_cols == {
        "record_id": "bigint",
        "clk": "array<int>",
        "n_bits": "int",
    }


def test_fast_and_portable_paths_agree_structurally(spark):
    """xxhash64 and md5 produce different positions but the same
    geometry: equal records -> identical filters, dup pairs stay the
    highest-Dice pairs under both hash families."""
    for portable in (True, False):
        enc = _enc(spark, portable=portable)
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_A bigint, id_B bigint"
        )
        d = {(r.id_A, r.id_B): r.dice for r in dice_pairs(pairs, enc).collect()}
        assert d[(1, 2)] > d[(1, 3)] > d[(1, 4)], portable


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = sorted(
        (r.record_id, tuple(r.clk))
        for r in clk_encode(df.coalesce(1), FIELDS, portable=True).collect()
    )
    b = sorted(
        (r.record_id, tuple(r.clk))
        for r in clk_encode(df.repartition(5), FIELDS, portable=True).collect()
    )
    assert a == b
