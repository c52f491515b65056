

def test_word_ngrams_short_doc_guard(spark):
    """Docs shorter than n words yield an EMPTY shingle set (sequence(0,-1)
    descends in Spark — the guard stops junk grams)."""
    from pyspark.sql import functions as F

    from macrobase_spark.operators.text import word_ngrams_expr

    df = spark.createDataFrame(
        [("a b",), ("a b c d",), ("",)], "text string"
    ).select(word_ngrams_expr("split(text, ' ')", 3).alias("g"))
    rows = sorted(r["g"] for r in df.collect())
    assert rows == [[], ["a b c", "b c d"], []] or sorted(map(tuple, rows)) == [
        (),
        (),
        ("a b c", "b c d"),
    ]


def test_benchmark_contamination_planted(spark):
    """A corpus doc sharing a 3-gram with the benchmark is flagged with the
    right overlap count; unrelated docs are not."""
    from macrobase_spark.operators.text import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma nine ten"),      # shares 'alpha beta gamma'
            (2, "beta gamma delta alpha beta gamma"),  # shares two grams
            (3, "one two three four"),              # clean
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_overlap"])
        for r in benchmark_contamination(corpus, bench).collect()
    }
    assert got == {(1, 1), (2, 2)}
