"""BPE trainer/encoder pins: driver path == distributed path == a naive
recount-every-round reference; encoder reconstructs text; determinism."""

from collections import Counter

import pytest

from record_linkage_spark.operators.bpe import (
    EOW,
    bpe_pair_counts,
    encode_bpe,
    initial_symbols,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    "low lower lowest newer newest",
    "low low low lower newer wider",
    "hugging faces hug hugs hugged",
    "the dog hugs the fox",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )


def _naive_reference(word_counts, num_merges, min_count=2):
    """Recount-every-round textbook BPE (Sennrich fig. 1 semantics)."""
    vocab = {w: tuple(w) + (EOW,) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pc[p] += word_counts[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b))
        merged = a + b
        for w, syms in list(vocab.items()):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges


def test_driver_path_matches_naive_reference(spark):
    docs = _docs(spark)
    wc = {r["w"]: r["n"] for r in word_frequencies(docs).collect()}
    got = train_bpe(docs, num_merges=30)
    assert got == _naive_reference(wc, 30)
    assert len(got) == 30


def test_distributed_path_matches_driver_path(spark):
    docs = _docs(spark)
    driver = train_bpe(docs, num_merges=20)
    dist = train_bpe(docs, num_merges=20, max_driver_words=0)
    assert dist == driver


def test_min_count_stops_the_loop(spark):
    docs = _docs(spark)
    wc = {r["w"]: r["n"] for r in word_frequencies(docs).collect()}
    got = train_bpe(docs, num_merges=10_000, min_count=3)
    assert got == _naive_reference(wc, 10_000, min_count=3)
    assert 0 < len(got) < 10_000


def test_pair_counts_first_round_weighted_and_overlapping(spark):
    # 'aaa' x2 contributes (a,a) twice per occurrence = 4 total
    docs = spark.createDataFrame(
        [(0, "aaa aaa b")], "doc_id int, text string"
    )
    syms = initial_symbols(word_frequencies(docs))
    pc = {(r["a"], r["b"]): r["n"] for r in bpe_pair_counts(syms).collect()}
    assert pc[("a", "a")] == 4
    assert pc[("a", EOW)] == 2
    assert pc[("b", EOW)] == 1


def test_encoder_reconstructs_text_and_respects_merges(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, num_merges=40)
    enc = encode_bpe(docs, merges).collect()
    for row in enc:
        # stripping EOW markers and re-joining reconstructs the words
        rebuilt = "".join(row["bpe_tokens"]).replace(EOW, " ").strip()
        assert rebuilt == row["text"].lower()
    # a frequent trained word must compress below its character length
    the = next(r for r in enc if r["text"].startswith("the quick"))
    n_the_tokens = len(
        [t for t in encode_bpe(
            spark.createDataFrame([(0, "the",)], "i int, text string"),
            merges,
        ).collect()[0]["bpe_tokens"]]
    )
    assert n_the_tokens < len("the") + 1
    assert the["bpe_tokens"] is not None


def test_encoder_null_text_stays_null(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "low")], "doc_id int, text string"
    )
    merges = train_bpe(_docs(spark), num_merges=10)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(docs, merges).collect()}
    assert rows[0] is None
    assert rows[1] is not None


def test_training_is_deterministic(spark):
    docs = _docs(spark)
    assert train_bpe(docs, num_merges=25) == train_bpe(docs, num_merges=25)
