"""Retrieval evaluation and rank fusion: the offline eval loop that sits
next to a retrieval stack (BM25 / ANN families) in a training-data
pipeline -- given a ranked run and graded relevance labels, compute
nDCG@k / MRR / precision@k / recall@k per query; and fuse two rankings
with reciprocal-rank fusion (Cormack et al. 2009).

Determinism policy (queries/__init__.py): every metric is exact integer
arithmetic.  The nDCG log2 discount runs through the fixed-point
recurrence (operators.text.ilog2_fp20) on DRIVER-side rank constants
(ranks 1..k -- a k-row broadcast literal), so Spark and the DuckDB oracle
twin produce bit-identical fixed-point discounts with no libm.

Scale shape: per-query ranking is a Window partitioned by query_id with a
rank<=k filter directly on top, which Spark rewrites to WindowGroupLimit
-- each partition keeps only its local top-k BEFORE the shuffle, so a
query whose hit set is 10^9 rows still moves only k rows per input
partition.  Relevance totals are plain partial-aggregated groupBys.
Nothing collects more than corpus-stat scalars at the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.text import ilog2_fp20


def ndcg_discounts_fp20(k: int) -> list[tuple[int, int]]:
    """(rank, disc_fp) for rank 1..k where disc_fp is the fp20 fixed-point
    of 1/log2(rank+1): (1<<40) // ilog2_fp20(rank+1).  Driver-side rank
    constants; the DuckDB oracle reproduces the identical values with the
    recursive-CTE log2 twin (queries/llm.py::duck_ilog2_sql pattern)."""
    return [(r, (1 << 40) // ilog2_fp20(r + 1)) for r in range(1, k + 1)]


def retrieval_eval(
    df: DataFrame,
    queries: dict[str, list[str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    rel_tf: int = 2,
    token_sql: str | None = None,
) -> DataFrame:
    """Multi-query BM25 run + graded-relevance evaluation in ONE pass over
    the corpus (one tokenize, shared corpus stats, a (query, term, idf)
    broadcast -- not one job per query).

    System under eval: exact-integer BM25 (operators.text.bm25_scores
    arithmetic, same k1=1.2 b=0.75 integer rational and fixed-point
    Robertson idf).  Relevance labels are INDEPENDENT of the score: a
    doc's graded gain for a query is the number of query terms occurring
    >= ``rel_tf`` times (0..len(terms)); relevant = gain >= 1.

    Per query_id: n_retrieved (<=k), n_rel_total (corpus-wide), n_rel_topk,
    first_rel_rank (0 = none), mrr_e6 = 1e6 // first_rel_rank,
    p_at_k_e6 = 1e6 * n_rel_topk // k, r_at_k_e6 = 1e6 * n_rel_topk //
    n_rel_total, ndcg_e6 = 1e6 * DCG_fp // IDCG_fp with the fp20 discount
    table and ideal ranking by gain over the whole corpus.

    ``token_sql``: SQL expression over ``text_col`` producing the token
    array (default: lowercase [a-z0-9]+ unigrams).  Pass a bigram/phrase
    derivation to retrieve on phrases -- document length, tf, and idf are
    then all in PHRASE units, self-consistently.
    """
    from odp_dynamic_data_pipeline_spark.operators.partitioning import ensure_min_parallelism

    spark = df.sparkSession
    all_terms = sorted({t for ts in queries.values() for t in ts})
    terms_arr = "array(" + ",".join(f"'{t}'" for t in all_terms) + ")"

    if token_sql is None:
        token_sql = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    tok = ensure_min_parallelism(df.select(id_col, text_col)).select(
        id_col,
        F.explode(F.expr(token_sql)).alias("__t"),
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    tf = (
        tok.where(F.expr(f"array_contains({terms_arr}, __t)"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # bounded driver constants: N, avgdl, df per term (<= |terms|+1 rows)
    n_row = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("dl").cast("long").alias("tot")
    ).first()
    if int(n_row["n"]) == 0:
        raise ValueError(
            "retrieval_eval: corpus is empty after tokenization (no document "
            "produced any token) -- avgdl/idf are undefined; check text_col "
            "and the tokenizer pattern"
        )
    n_docs, avgdl = int(n_row["n"]), int(n_row["tot"]) // int(n_row["n"])
    dfs = {
        r["__t"]: int(r["n"])
        for r in tf.groupBy("__t").agg(F.countDistinct(id_col).alias("n")).collect()
    }
    qt_rows = [
        (qid, t, ilog2_fp20(2 * n_docs - 2 * dfs[t] + 1) - ilog2_fp20(2 * dfs[t] + 1))
        for qid, ts in queries.items()
        for t in ts
        if t in dfs
    ]
    from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

    qt = local_relation(spark, qt_rows, "query_id string, __t string, idf_fp long")

    # per-(query, doc): BM25 score + graded gain, one broadcast join
    qd = (
        tf.join(F.broadcast(qt), "__t")
        .join(dl, id_col)
        .withColumn(
            "__contrib",
            F.expr(
                f"idf_fp * ((1000000 * (44 * tf * {avgdl}))"
                f" div (20 * tf * {avgdl} + 6 * {avgdl} + 18 * dl))"
            ),
        )
        .groupBy("query_id", id_col)
        .agg(
            F.sum("__contrib").cast("long").alias("score_fp"),
            F.sum((F.col("tf") >= rel_tf).cast("long")).cast("long").alias("gain"),
        )
    )
    qd = qd.persist()

    from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

    disc = local_relation(spark, ndcg_discounts_fp20(k), "rank long, disc_fp long")

    # retrieved run: per-query top-k by (score desc, id) -- WindowGroupLimit
    w_run = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col(id_col).asc()
    )
    run = (
        qd.withColumn("rank", F.row_number().over(w_run).cast("long"))
        .where(F.col("rank") <= k)
        .join(F.broadcast(disc), "rank")
    )
    run_agg = run.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum((F.col("gain") >= 1).cast("long")).cast("long").alias("n_rel_topk"),
        F.coalesce(
            F.min(F.when(F.col("gain") >= 1, F.col("rank"))), F.lit(0)
        ).cast("long").alias("first_rel_rank"),
        F.sum(F.when(F.col("gain") >= 1, F.col("gain") * F.col("disc_fp")).otherwise(0))
        .cast("long")
        .alias("dcg_fp"),
    )

    # ideal ranking: per-query top-k by gain over the WHOLE corpus
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col(id_col).asc()
    )
    ideal = (
        qd.where(F.col("gain") >= 1)
        .withColumn("rank", F.row_number().over(w_ideal).cast("long"))
        .where(F.col("rank") <= k)
        .join(F.broadcast(disc), "rank")
        .groupBy("query_id")
        .agg(F.sum(F.col("gain") * F.col("disc_fp")).cast("long").alias("idcg_fp"))
    )
    totals = qd.groupBy("query_id").agg(
        F.sum((F.col("gain") >= 1).cast("long")).cast("long").alias("n_rel_total")
    )

    out = (
        run_agg.join(totals, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            "n_retrieved",
            F.coalesce("n_rel_total", F.lit(0)).cast("long").alias("n_rel_total"),
            "n_rel_topk",
            "first_rel_rank",
            F.when(F.col("first_rel_rank") > 0, F.expr("1000000 div first_rel_rank"))
            .otherwise(0)
            .cast("long")
            .alias("mrr_e6"),
            F.expr(f"(1000000 * n_rel_topk) div {k}").cast("long").alias("p_at_k_e6"),
            F.when(
                F.col("n_rel_total") > 0,
                F.expr("(1000000 * n_rel_topk) div n_rel_total"),
            )
            .otherwise(0)
            .cast("long")
            .alias("r_at_k_e6"),
            F.when(
                F.coalesce(F.col("idcg_fp"), F.lit(0)) > 0,
                F.expr("(1000000 * dcg_fp) div idcg_fp"),
            )
            .otherwise(0)
            .cast("long")
            .alias("ndcg_e6"),
        )
    )
    # |queries| output rows: eager-materialize so the shared (query, doc)
    # table computes once across the three metric legs, then release it
    out = out.localCheckpoint(eager=True)
    qd.unpersist()
    return out


def rrf_fuse(
    runs: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): each system
    contributes 1e9 // (c + rank) for the ids it ranked; ids missing from
    a system contribute nothing (standard fused-run semantics over
    retrieved lists).  Exact integer: rrf_e9 is a sum of integer floor
    divisions, ties broken by id.

    Inputs are RANKED RUNS (id + dense 1-based rank), expected to be
    top-N-bounded upstream (TakeOrderedAndProject), so the union the
    fusion aggregates is |systems| * N rows -- never corpus-scale.
    Output: (id_col, rank_<system>... , rrf_e9) top-k."""
    tagged = []
    for name, run in runs.items():
        tagged.append(
            run.select(
                F.col(id_col),
                F.lit(name).alias("__sys"),
                F.col(rank_col).cast("long").alias("__rank"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    aggs = [
        F.min(F.when(F.col("__sys") == name, F.col("__rank"))).cast("long").alias(f"rank_{name}")
        for name in runs
    ]
    fused = u.groupBy(id_col).agg(
        *aggs,
        F.sum(F.expr(f"1000000000 div ({c} + __rank)")).cast("long").alias("rrf_e9"),
    )
    return fused.orderBy(F.col("rrf_e9").desc(), F.col(id_col).asc()).limit(k)
