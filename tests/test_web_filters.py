"""C4-style heuristic web filters — hand truth tables for every rule."""

from record_linkage_spark.operators.web_filters import c4_filters


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in c4_filters(df, **kw).collect()}


def test_line_filter_terminal_punct_and_min_words(spark):
    text = (
        "A good long sentence here.\n"      # kept
        "too short.\n"                       # 2 words -> dropped
        "no terminal punctuation at all\n"   # dropped
        'He said "stop".\n'                  # kept (ends with .)
        "Is this kept?\n"                    # kept (?)
        "Definitely kept now!"               # kept (!)
    )
    out = _run(spark, [(1, text)], min_sentences=1)[1]
    assert out["n_lines"] == 6
    assert out["n_kept_lines"] == 4
    assert out["kept_text"].splitlines() == [
        "A good long sentence here.",
        'He said "stop".',
        "Is this kept?",
        "Definitely kept now!",
    ]
    assert out["keep"] is True


def test_doc_level_rules(spark):
    good = "\n".join(["This is a fine sentence number %d." % i for i in range(6)])
    rows = [
        (1, good),                                   # keeps
        (2, good + "\nAll Rights Reserved."),        # blocklist
        (3, good + "\nLorem ipsum dolor sit amet."), # lorem
        (4, good + "\nvar x = {1};"),                # brace
        (5, "Only two sentences here. And the second one."),  # too few
        (6, None),                                   # null text
    ]
    out = _run(spark, rows)
    assert [out[i]["keep"] for i in range(1, 7)] == [
        True, False, False, False, False, False,
    ]
    assert out[2]["has_blocked"] and not out[2]["has_lorem"]
    assert out[3]["has_lorem"] and out[4]["has_brace"]
    assert out[5]["n_sentences"] == 2
    assert out[6]["n_lines"] == 0 and out[6]["kept_text"] is None


def test_sentence_proxy_counts_terminal_marks_in_kept_text(spark):
    # two marks inside one kept line both count (the paper's proxy);
    # marks on dropped lines do not
    text = "Dr. Smith arrived today.\nbad line!!! no really bad"
    out = _run(spark, [(1, text)], min_sentences=1)[1]
    assert out["n_kept_lines"] == 1
    assert out["n_sentences"] == 2


def test_thresholds_are_parameters(spark):
    text = "One two.\nAlpha beta gamma delta."
    strict = _run(spark, [(1, text)], min_words=3, min_sentences=2)[1]
    loose = _run(spark, [(1, text)], min_words=2, min_sentences=2)[1]
    assert strict["n_kept_lines"] == 1 and strict["keep"] is False
    assert loose["n_kept_lines"] == 2 and loose["keep"] is True


def _grun(spark, rows, **kw):
    from record_linkage_spark.operators.web_filters import gopher_filters

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_filters(df, **kw).collect()}


GOOD = (
    "the quick brown fox jumps over and that lazy dog with glee of be to have"
)  # 16 words, every stop-word rule satisfied


def test_gopher_word_count_and_mean_length(spark):
    out = _grun(
        spark,
        [(1, GOOD), (2, "tiny doc."), (3, None)],
        min_words=10,
    )
    assert out[1]["n_words"] == 16 and out[1]["keep"] is True
    assert out[2]["n_words"] == 2 and out[2]["keep"] is False
    assert out[3]["n_words"] == 0 and out[3]["keep"] is False
    total = sum(len(w) for w in GOOD.split())
    assert out[1]["mean_word_len"] == round(total / 16, 6)


def test_gopher_symbol_ratio_and_alpha_words(spark):
    hashy = GOOD + " " + "#" * 5
    out = _grun(spark, [(1, hashy)], min_words=10)[1]
    # 5 '#' chars over 17 words > 0.1 -> dropped; the '#####' word has no
    # letter so alpha fraction dips below 1
    assert out["symbol_word_ratio"] == round(5 / 17, 6)
    assert out["alpha_word_frac"] == round(16 / 17, 6)
    assert out["keep"] is False
    dots = GOOD + " so..." + " then..."
    out = _grun(spark, [(1, dots)], min_words=10)[1]
    assert out["symbol_word_ratio"] == round(2 / 18, 6)


def test_gopher_line_rules(spark):
    bullets = "\n".join(["• item one here", "- item two here", GOOD])
    out = _grun(spark, [(1, bullets)], min_words=10,
                max_bullet_line_frac=0.5)[1]
    assert out["bullet_line_frac"] == round(2 / 3, 6)
    assert out["keep"] is False
    trailing = "\n".join([GOOD, "to be continued...", "more soon..."])
    out = _grun(spark, [(1, trailing)], min_words=10)[1]
    assert out["ellipsis_line_frac"] == round(2 / 3, 6)
    assert out["keep"] is False


def test_gopher_stop_words(spark):
    no_stops = " ".join(["word%d" % i for i in range(20)])
    out = _grun(spark, [(1, no_stops)], min_words=10)[1]
    assert out["n_stop_hits"] == 0 and out["keep"] is False
    one_stop = no_stops + " the"
    out = _grun(spark, [(1, one_stop)], min_words=10, min_stop_words=1)[1]
    assert out["n_stop_hits"] == 1 and out["keep"] is True


def test_custom_blocklist(spark):
    text = "\n".join(["Sentence number %d is fine." % i for i in range(6)])
    out = _run(
        spark, [(1, text + "\nVisit example dot com now.")],
        blocklist=("example dot com",),
    )[1]
    assert out["has_blocked"] and out["keep"] is False


def test_compression_ratio_filter_flags_repetition_and_noise(spark):
    from record_linkage_spark.operators.web_filters import (
        compression_ratio_filter,
    )

    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(4000))
    rows = [
        (0, "spam " * 2000),                      # hyper-compressible
        (1, noise),                               # near-incompressible
        (2, "A normal paragraph about record linkage, with varied "
            "vocabulary, appearing once and reading like prose. " * 8),
        (3, None),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in compression_ratio_filter(
            spark.createDataFrame(rows, "doc_id int, text string")
        ).collect()
    }
    assert out[0]["compression_ratio"] > 12.0 and not out[0]["keep"]
    assert out[1]["compression_ratio"] < 1.2 and not out[1]["keep"]
    assert 1.2 <= out[2]["compression_ratio"] <= 12.0 and out[2]["keep"]
    assert out[3]["compression_ratio"] is None and not out[3]["keep"]
    assert out[4]["compression_ratio"] is None and not out[4]["keep"]


def test_compression_ratio_filter_is_zero_shuffle(spark):
    from record_linkage_spark.operators.web_filters import (
        compression_ratio_filter,
    )

    docs = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    plan = compression_ratio_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_blocklist_filter_paths_agree_and_count_distinct_terms(spark):
    from record_linkage_spark.operators.web_filters import blocklist_filter

    rows = [
        (0, "The LOREM ipsum text with lorem repeated"),  # 2 distinct hits
        (1, "perfectly clean prose here"),
        (2, None),
        (3, "ipsum"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    terms = ["lorem", "ipsum", "badword"]
    lit_path = {
        r["doc_id"]: (r["n_blocklist_hits"], r["keep"])
        for r in blocklist_filter(docs, terms).collect()
    }
    join_path = {
        r["doc_id"]: (r["n_blocklist_hits"], r["keep"])
        for r in blocklist_filter(docs, terms, max_literal_terms=0).collect()
    }
    df_path = {
        r["doc_id"]: (r["n_blocklist_hits"], r["keep"])
        for r in blocklist_filter(
            docs, spark.createDataFrame([(t,) for t in terms], "t string")
        ).collect()
    }
    assert lit_path == join_path == df_path
    assert lit_path[0] == (2, False)
    assert lit_path[1] == (0, True)
    assert lit_path[2] == (None, None)
    assert lit_path[3] == (1, False)


def test_blocklist_literal_path_is_zero_shuffle(spark):
    from record_linkage_spark.operators.web_filters import blocklist_filter

    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = blocklist_filter(docs, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
