"""Python UDTF surface (SURVEY §2.10: the reference has no
UDTFs/table functions; Spark 4 provides them natively and the engine
exposes one as the sanctioned table-function escape hatch).

``sentence_split`` is a lateral table function: one document row in,
one row per sentence out, with position and length — the shape used
for chunking training documents. Kept OFF hot paths (row-based Python)
— the set-oriented equivalent for bulk work is
``explode(split(...))``, and ``sentences_exploded`` below shows that
expression form; the UDTF exists for the API surface and for logic too
imperative for expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..catalog import load_table


@udtf(returnType="sentence string, pos int, n_chars int")
class SentenceSplit:
    """Split text on sentence-ending punctuation; trims and drops
    empties. Imperative logic (stateful position counter) — the kind
    of row expansion a UDTF exists for."""

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        pos = 0
        buf = []
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                s = "".join(buf).strip()
                if s:
                    yield s, pos, len(s)
                    pos += 1
                buf = []
        tail = "".join(buf).strip()
        if tail:
            yield tail, pos, len(tail)


def register(spark: SparkSession) -> None:
    """Make the UDTF callable from SQL: ``SELECT * FROM
    sentence_split('a. b.')`` or via LATERAL over a table."""
    spark.udtf.register("sentence_split", SentenceSplit)


def sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents × LATERAL sentence_split(text)."""
    register(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_docs_for_udtf"
    )
    return spark.sql(
        "SELECT d.doc_id, s.sentence, s.pos, s.n_chars "
        "FROM _docs_for_udtf d, LATERAL sentence_split(d.text) s"
    )


def sentences_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expression-only equivalent (regex split + posexplode +
    filter) — the form the hot path should use; tests assert it agrees
    with the UDTF on sentence text."""
    d = load_table(spark, sf_dir, "documents")
    parts = F.expr(
        r"filter(transform(split(text, '(?<=[.!?])'), x -> trim(x)),"
        r" x -> x != '')"
    )
    return d.select(
        "doc_id",
        F.posexplode(parts).alias("pos", "sentence"),
    ).select("doc_id", "sentence", F.col("pos").cast("int").alias("pos"),
             F.length("sentence").cast("int").alias("n_chars"))


QUERIES: dict = {"text_sentences": sentences_exploded}

# DuckDB's RE2 has no lookbehind, but the lookbehind SPLIT has an
# extraction twin RE2 can run: a sentence is either a (possibly empty)
# terminator-ended segment or the unterminated tail — the pieces and
# their order are identical to split-after-terminator.
# tests/test_udtf.py asserts parity on punctuation-rich constructed
# docs (the parquet fixture is single-sentence), and UDTF↔expression
# equivalence separately.
ORACLES: dict = {
    "text_sentences": r"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(
           regexp_extract_all(text, '[^.!?]*[.!?]|[^.!?]+$'),
           x -> trim(x)), x -> x <> '') AS parts
  FROM documents
)
SELECT doc_id, unnest(parts) AS sentence,
       CAST(generate_subscripts(parts, 1) - 1 AS INTEGER) AS pos,
       CAST(length(unnest(parts)) AS INTEGER) AS n_chars
FROM s
"""}
