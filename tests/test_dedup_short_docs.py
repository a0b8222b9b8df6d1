"""Short-document guards (ADVICE r01): docs with < 3 tokens or < 5
chars must not crash Spark (descending sequence() → element_at(_, 0)
throws) and must stay bit-identical to the DuckDB oracle, which gets
empty lists from range() naturally."""

import duckdb
import pytest

from customer_churn_prediction_spark.text import dedup

from .oracle_utils import canonical_rows

SHORT_DOCS = [
    (1, ""),                       # empty
    (2, "hi"),                     # < 5 chars, 1 token
    (3, "one two"),                # 2 tokens — the element_at(0) trap
    (4, "a b"),                    # 2 one-char tokens
    (5, "alpha beta gamma delta"),  # normal doc
    (6, "alpha beta gamma delta"),  # exact dup of 5
    (7, "tiny"),                   # 4 chars: below SHINGLE width
]


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    spark.createDataFrame(SHORT_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql).df()


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_signatures",
        "dedup_minhash_lsh_pairs",
        "dedup_lsh_groups",
        "dedup_lsh_components",
        "dedup_incremental",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_lsh_verified",
    ],
)
def test_short_docs_no_crash_and_oracle_parity(name, spark, short_dir):
    sdf = dedup.QUERIES[name](spark, short_dir).toPandas()
    odf = _oracle(dedup.ORACLES[name], short_dir)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canonical_rows(sdf) == canonical_rows(odf)


def test_minhash_short_text_yields_null_signature(spark, short_dir):
    rows = {
        r.doc_id: r
        for r in dedup.minhash_signatures(spark, short_dir).collect()
    }
    assert rows[7].mh0 is None, "sub-shingle doc must produce NULL minhash"
    assert rows[5].mh0 is not None


def test_lsh_components_match_union_find(spark, sf_dir):
    """Transitive components must equal union-find over the pairwise
    LSH candidate edges (the definitionally-correct but quadratic
    form)."""
    from customer_churn_prediction_spark.text import dedup

    pairs = dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    got = {
        r.doc_id: r.label
        for r in dedup.lsh_dedup_components(spark, sf_dir).collect()
    }

    parent: dict[int, int] = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    assert got == want
