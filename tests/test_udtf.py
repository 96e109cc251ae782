"""Python UDTF surface (Spark 4): a table-valued function usable from
SQL with LATERAL — the escape hatch for one-row-to-many-rows logic the
built-ins can't express. The test pins its output to the built-in
``posexplode(split(...))`` plan, which IS the hot path for this
particular job: the UDTF exists to prove the surface, and the parity
assertion documents that reaching for it here costs a Python stage for
identical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from copenhagen_traffic_and_weather_etl_pipeline_spark.testdata import sf_dir

SF_DIR = sf_dir("0.001")


@udtf(returnType="pos: int, word: string")
class TokenizeWords:
    """Whitespace tokenizer as a table function: one doc row in,
    one row per (position, token) out."""

    def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
        if text is None:
            return
        for i, w in enumerate(text.split()):
            yield i, w


def test_udtf_lateral_matches_builtin_posexplode(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_words", TokenizeWords)

    via_udtf = spark.sql(
        "SELECT d.doc_id, t.pos, t.word "
        "FROM udtf_docs d, LATERAL tokenize_words(d.text) t"
    )
    # filter('' tokens): Python str.split() drops empties, so an
    # empty/whitespace-only doc tokenizes to zero rows on both paths
    via_builtin = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.regexp_replace(F.trim("text"), r"\s+", " "), " "),
                lambda x: x != "",
            )
        ).alias("pos", "word"),
    )
    got = {tuple(r) for r in via_udtf.collect()}
    want = {tuple(r) for r in via_builtin.collect()}
    assert got == want
    assert len(got) > 0


def test_udtf_handles_null_and_empty(spark):
    spark.udtf.register("tokenize_words2", TokenizeWords)
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")], "id int, text string"
    )
    df.createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT e.id, t.pos, t.word "
        "FROM udtf_edge e, LATERAL tokenize_words2(e.text) t"
    ).collect()
    # NULL yields nothing; empty string yields nothing (str.split()).
    assert {(r["id"], r["pos"], r["word"]) for r in rows} == {
        (1, 0, "a"),
        (1, 1, "b"),
    }
