"""ANN recall matrix: every index tier graded against exact search in
one queryable report.

``ann_recall_eval`` grades the LSH tier; an embedding platform tuning
its serving stack wants ALL the tiers' recall side by side — LSH
buckets, IVF probes, int8 store, PQ ADC, IVF-PQ — against the same
exact cosine top-k baseline. Each method's result set is the engine's
own registry query and each oracle is the method's COMMITTED oracle
nested as a CTE, so the report cannot drift from the graded tiers
(the ``corpus_keep_decision`` composition discipline).

Metric note: the baseline ranks by exact cosine; the PQ tiers rank by
L2² ADC over unnormalized vectors, so their recall@k measures
agreement with the production cosine ranking — the deployment-relevant
number — not L2-self-consistency (which tests/test_pq.py covers).

Scale: every side is |queries|·k rows; the matrix costs five tiny
joins regardless of corpus size. Zero-hit methods still report (the
method list is a literal frame outer-joined onto the hit counts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ann, pq

_DENOM = ann.N_QUERIES * ann.TOP_K

# method name -> (query fn, committed oracle)
_METHODS = {
    "int8_bruteforce": (ann.ann_bruteforce_int8, None),
    "ivf": (ann.ann_ivf, None),
    "ivf_pq": (pq.ann_ivf_pq, None),
    "lsh_bucketed": (ann.ann_lsh_bucketed, None),
    "pq_adc": (pq.ann_pq_adc, None),
    # r9: JL random projection — fidelity is margin-dependent and this
    # fixture's margins are chance-level (see the ann.py RP note), so
    # its ~0.5 row IS the honest measurement the matrix exists to show
    "rp_topk": (ann.ann_rp_topk, None),
}


def ann_recall_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ANN tier graded against exact search in one report:
    per-tier recall@k over the shared query set."""
    exact = ann.ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hit_frames = []
    for name, (fn, _) in _METHODS.items():
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        hit_frames.append(
            approx.join(exact, ["query_id", "neighbor_id"]).select(
                F.lit(name).alias("method")
            )
        )
    hits = hit_frames[0]
    for f in hit_frames[1:]:
        hits = hits.unionByName(f)
    counts = hits.groupBy("method").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    methods = spark.createDataFrame(
        [(m,) for m in _METHODS], "method string"
    )
    return (
        methods.join(counts, "method", "left")
        .select(
            "method",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(_DENOM)), 6
            ).alias("recall"),
        )
        .orderBy("method")
    )


def _oracle() -> str:
    method_sql = {
        "int8_bruteforce": ann.ORACLES["ann_bruteforce_int8"],
        "ivf": ann.ORACLES["ann_ivf"],
        "ivf_pq": pq.IVF_PQ_ORACLE,
        "lsh_bucketed": ann.ORACLES["ann_lsh_bucketed"],
        "pq_adc": pq.ADC_ORACLE,
        "rp_topk": ann.STAGED_ORACLES["ann_rp_topk"],
    }
    ctes = ",\n".join(
        f"m_{name} AS (\n{sql}\n)" for name, sql in method_sql.items()
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS method, query_id, neighbor_id FROM m_{name}"
        for name in method_sql
    )
    values = ", ".join(f"('{m}')" for m in method_sql)
    return f"""
WITH exact AS (
{ann.ORACLES["ann_bruteforce_topk"]}
),
{ctes},
all_approx AS (
{unions}
),
hit_counts AS (
  SELECT a.method, CAST(count(*) AS BIGINT) AS n_hits
  FROM all_approx a
  JOIN exact e ON e.query_id = a.query_id
              AND e.neighbor_id = a.neighbor_id
  GROUP BY a.method
)
SELECT m.method,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / CAST({_DENOM} AS DOUBLE), 6) AS recall
FROM (VALUES {values}) AS m(method)
LEFT JOIN hit_counts h ON h.method = m.method
ORDER BY m.method
"""


RECALL_MATRIX_ORACLE = _oracle()

# r10 graduation: the matrix enters the registry (slot freed by
# retiring ann_bruteforce_topk — registry.RETIRED). It RUNS the exact
# bruteforce, pq_adc and ivf_pq forms as components in both engines,
# so the retirees' code stays driver-exercised every round through the
# matrix's hash compare; tests/test_recall_matrix.py keeps the
# standalone driver-rigor parity.
QUERIES = {"ann_recall_matrix": ann_recall_matrix}
ORACLES = {"ann_recall_matrix": RECALL_MATRIX_ORACLE}
