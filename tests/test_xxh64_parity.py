"""Parity evidence for the r15-evaluated (rejected) XXH64 co-change.

VERDICT r14 item 1 proposed md5 → xxhash64 for the dedup/selection
hash pipelines. The evaluation is recorded in OPTIMIZATION_r15.md §1:
implemented, verified correct against the driver-style oracle
compare, then reverted on measurement (engine-side gain ~1.1x, the
DuckDB macro ~200x slower than native md5 — the oracle would cost
tens of minutes per verify). These tests keep the feasibility half of
that record executable: the DuckDB macro in
``customer_churn_prediction_spark.xxh64`` IS a bit-exact Spark
``xxhash64``, pinned at all three corners:

  Python reference  ==  DuckDB macro     (adversarial vectors, incl.
                                          the ≥32-byte stripe path)
  Python reference  ==  Spark xxhash64   (same vectors + the 2-arg
                                          seed-chaining forms)
  DuckDB macro      ==  Spark xxhash64   (every string class the real
                                          corpus hashes at SF_SMOKE)
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.xxh64 import (
    hash_bytes,
    int_chain_seed,
    oracle_prelude,
    str_chain_seed,
)


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _vectors() -> list[str]:
    """Printable-ASCII strings covering every XXH64 code path: empty,
    every tail combination (1-7 bytes, 4-byte chunk, 8-byte chunks)
    and multi-stripe (>=32, >=64, >=96) lengths."""
    rng = random.Random(0xC0FFEE)
    out = []
    for ln in list(range(0, 36)) + [47, 63, 64, 65, 95, 96, 100, 127, 131]:
        for _ in range(4):
            out.append("".join(chr(rng.randint(32, 126)) for _ in range(ln)))
    return out


def test_spec_vectors():
    """Known public XXH64 vectors (seed 0)."""
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert hash_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert hash_bytes(b"abc", 0) == 0x44BC2CF5AD770999
    # 39 bytes -> exercises the 32-byte stripe accumulator path
    assert (
        hash_bytes(b"Nobody inspects the spammish repetition", 0)
        == 0xFBCEA83C8A378BF1
    )


def test_duckdb_macro_matches_reference():
    con = duckdb.connect()
    con.execute(oracle_prelude())
    rng = random.Random(7)
    rows = [
        (s, rng.choice([42, 0, 2**63 - 1, 2**63, 2**64 - 1, 987654321]))
        for s in _vectors()
    ]
    con.execute("CREATE TABLE t(s VARCHAR, sd UBIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = con.execute("SELECT s, sd, xxh_str(s, sd), xxh_str_s(s, sd) FROM t").fetchall()
    assert len(got) == len(rows)
    for s, sd, u, sg in got:
        exp = hash_bytes(s.encode(), int(sd))
        assert int(u) == exp, (s, sd)
        assert int(sg) == _to_signed(exp), (s, sd)


def test_spark_xxhash64_matches_reference(spark):
    strs = _vectors()
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        # the minhash seeding form: int literal chained before the string
        F.xxhash64(F.lit(3), F.col("s")).alias("h2"),
        # the DSIR seeding form: string literal chained before the gram
        F.xxhash64(F.lit("dsir|"), F.col("s")).alias("h3"),
    ).collect()
    for r in rows:
        b = r.s.encode()
        assert r.h1 == _to_signed(hash_bytes(b, 42))
        assert r.h2 == _to_signed(hash_bytes(b, int_chain_seed(3)))
        assert r.h3 == _to_signed(hash_bytes(b, str_chain_seed("dsir|")))


@pytest.fixture(scope="module")
def corpus_strings(sf_dir):
    """Every string class the pipelines hash, from the real corpus:
    5-char shingles, word 3-grams, distinct tokens, DSIR uni/bigrams."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    shingles = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(list_transform("
            "  range(1, greatest(length(text) - 3, 1)),"
            "  i -> substring(text, i::INT, 5))) FROM documents"
            " WHERE text IS NOT NULL AND length(text) >= 5"
        ).fetchall()
    ]
    grams = [
        r[0]
        for r in con.execute(
            "WITH t AS (SELECT string_split_regex(trim(lower(text)),"
            " '\\s+') AS tk FROM documents WHERE text IS NOT NULL)"
            " SELECT DISTINCT unnest(list_transform("
            "  range(1, greatest(len(tk) - 1, 1)),"
            "  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))"
            " FROM t WHERE len(tk) >= 3"
        ).fetchall()
    ]
    tokens = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split_regex(trim(lower(text)),"
            " '\\s+')) FROM documents WHERE text IS NOT NULL"
        ).fetchall()
    ]
    return shingles, grams, tokens


def test_macro_matches_spark_on_real_corpus(spark, corpus_strings):
    """The decisive corner: for every string the dedup/DSIR pipelines
    hash at SF_SMOKE, the DuckDB macro and Spark's xxhash64 agree —
    including the exact seeded forms each pipeline uses."""
    shingles, grams, tokens = corpus_strings
    con = duckdb.connect()
    con.execute(oracle_prelude())

    def spark_hashes(strs, col):
        df = spark.createDataFrame([(s,) for s in strs], ["s"])
        return {r.s: r.h for r in df.select("s", col.alias("h")).collect()}

    def duck_hashes(strs, seed):
        con.execute("CREATE OR REPLACE TABLE t(s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strs])
        return {
            s: int(h)
            for s, h in con.execute(
                f"SELECT s, xxh_str_s(s, {seed}::UBIGINT) FROM t"
            ).fetchall()
        }

    # minhash: per-shingle, every int-chained seed the signature uses
    for i in (0, 5):
        sp = spark_hashes(shingles, F.xxhash64(F.lit(i), F.col("s")))
        du = duck_hashes(shingles, int_chain_seed(i))
        assert sp == du, f"shingle seed {i}"
    # word 3-grams and simhash tokens: plain seed-42 string hash
    for strs in (grams, tokens):
        sp = spark_hashes(strs, F.xxhash64("s"))
        du = duck_hashes(strs, 42)
        assert sp == du
    # DSIR: string-literal chained seed over unigrams (tokens stand in)
    sp = spark_hashes(tokens, F.xxhash64(F.lit("dsir|"), F.col("s")))
    du = duck_hashes(tokens, str_chain_seed("dsir|"))
    assert sp == du
