"""Text-analysis operators (X20) on literal strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_lakehouse_medallion_pipeline_spark.operators import text


def _one(spark, s: str, col):
    return spark.createDataFrame([(s,)], "t string").select(col(F.col("t")).alias("o")).head()["o"]


def test_normalized_text(spark):
    assert _one(spark, "  Hello   WORLD  ", text.normalized_text) == "hello world"


def test_token_counts(spark):
    assert _one(spark, "one two  three", text.token_count) == 3
    # BPE-ish: "don't" -> don + ' + t ; "abc123" -> abc + 123
    assert _one(spark, "don't abc123", text.bpe_ish_token_count) == 5


def test_avg_token_length(spark):
    assert _one(spark, "ab abcd", text.avg_token_length) == 3.0


def test_stopword_and_punct_ratio(spark):
    assert _one(spark, "the cat and the dog", text.stopword_ratio) == 0.6
    assert _one(spark, "ab!!", text.punct_ratio) == 0.5


def test_quality_score_prose_beats_noise(spark):
    prose = _one(spark, "the quick brown fox jumps over the lazy dog and runs", text.quality_score)
    noise = _one(spark, "!!! ### $$$ %%% ^^^ &&&", text.quality_score)
    assert prose == 1.0
    assert noise < prose


def test_fingerprints_match_on_normalized_dups(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("other",)], "t string"
    )
    fps = [
        r["f"]
        for r in df.select(text.fingerprint_md5(F.col("t")).alias("f")).collect()
    ]
    assert fps[0] == fps[1] != fps[2]
    rolling = [
        r["f"]
        for r in df.select(text.fingerprint_rolling(F.col("t")).alias("f")).collect()
    ]
    assert rolling[0] == rolling[1]


def test_lang_id(spark):
    cases = {
        "this is the house and the garden": "en",
        "le chat est sur la table et il dort": "fr",
        "el perro y el gato es bonito": "es",
        "der hund und die katze ist hier": "de",
        "xyzzy plugh": "unknown",
    }
    for s, want in cases.items():
        assert _one(spark, s, text.lang_id) == want, s


def test_text_stats_block(documents):
    out = text.text_stats(documents.limit(20))
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_chars"] > 0 and r["n_tokens"] > 0
        assert r["n_subword_tokens"] >= r["n_tokens"] - 1
        assert 0.0 <= r["quality_score"] <= 1.0
        assert len(r["fingerprint"]) == 32


def test_pack_sequences_invariants(documents):
    """Packing invariants per source stream: offsets within [0, ctx),
    spans >= 1, and contiguity — each doc starts exactly where the
    previous one ended (concat-then-chunk leaves no gaps)."""
    from spark_lakehouse_medallion_pipeline_spark.operators.text import pack_sequences

    ctx = 128
    rows = pack_sequences(documents, ctx_len=ctx).collect()
    assert all(0 <= r["pack_offset"] < ctx for r in rows)
    assert all(r["n_packs_spanned"] >= 1 for r in rows)
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for docs_ in by_source.values():
        docs_.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in docs_:
            assert r["pack_id"] * ctx + r["pack_offset"] == pos
            pos += r["n_tokens"]


def test_strip_html_planted(spark):
    from spark_lakehouse_medallion_pipeline_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [
            ('<div><a href="x">link</a> text &amp; more &lt;3 &quot;q&quot;</div>',),
            ("no markup here",),
        ],
        "raw string",
    )
    got = [r["c"] for r in df.select(strip_html(F.col("raw")).alias("c")).collect()]
    assert got[0] == 'link text & more <3 "q"'
    assert got[1] == "no markup here"


def test_adaptive_length_filter_per_group(spark):
    """The gate is per-group: a 40-char doc survives in a terse language
    (median 50) but the same length dies in a verbose one (median 400)."""
    from spark_lakehouse_medallion_pipeline_spark.operators.text import (
        adaptive_length_filter,
    )

    df = spark.createDataFrame(
        [(1, "terse", 50), (2, "terse", 40), (3, "terse", 60),
         (4, "verbose", 400), (5, "verbose", 40), (6, "verbose", 500)],
        "doc_id long, lang string, n_chars long",
    )
    kept = {r["doc_id"] for r in adaptive_length_filter(df).collect()}
    assert 2 in kept      # 40 >= 0.5*50
    assert 5 not in kept  # 40 <  0.5*400
    assert kept >= {1, 3, 4, 6}
