"""Embedding-space retrieval and clustering queries: exact/ANN top-k
(IVF, SRP-LSH, PQ, IVF-PQ), k-means/k-center training, SemDeDup (batch,
scaled, broadcast-path, streaming), BM25 + fusion + retrieval eval, and
Arrow embedding plumbing.  Split from queries/llm.py in r13 (size only;
no behavior change).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators import dedup as dd
from odp_dynamic_data_pipeline_spark.operators import multimodal as mm
from odp_dynamic_data_pipeline_spark.operators import similarity as sim
from odp_dynamic_data_pipeline_spark.operators import text as tx
from odp_dynamic_data_pipeline_spark.queries import register
from odp_dynamic_data_pipeline_spark.queries import xxh64_sql as _xx
from odp_dynamic_data_pipeline_spark.sources.catalog import load_table


EMB_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
pairs AS (
  SELECT qe.vec_id AS qid, ce.vec_id AS cand_id, UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM e qe, e ce
  WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
),
dots AS (SELECT qid, cand_id, CAST(SUM(qv * cv) AS BIGINT) AS dot FROM pairs GROUP BY qid, cand_id),
scored AS (
  SELECT d.qid, d.cand_id,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.qid
  JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, rank, cosine FROM (
  SELECT qid, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
"""



@register("embedding_cosine_topk", EMB_TOPK_ORACLE)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 query vectors.
    Quantized to integer micro-units so both engines agree bitwise; dot
    products via zip_with/aggregate stay JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)



@register(
    "embedding_neardup_by_label",
    """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, UNNEST(a.q) AS av, UNNEST(b.q) AS bv
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
),
dots AS (SELECT id_a, id_b, CAST(SUM(av * bv) AS BIGINT) AS dot FROM pairs GROUP BY id_a, id_b)
SELECT d.id_a, d.id_b,
       CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) >= 0.18
""",
)
def embedding_neardup_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with label blocking (the blocking key cuts
    the pair space by ~|labels|x -- the same role LSH buckets play when no
    natural key exists)."""
    emb = sim.quantized(load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("label"), F.col("qvec").alias("qa"), F.col("qnorm").alias("na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("label"), F.col("qvec").alias("qb"), F.col("qnorm").alias("nb"))
    pairs = a.join(b, "label").where(F.col("id_a") < F.col("id_b"))
    dot = F.expr(sim.DOT.format(a="qa", b="qb"))
    cosine = dot.cast("double") / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
    return pairs.select("id_a", "id_b", cosine.alias("cosine")).where(F.col("cosine") >= 0.18)



@register(
    "label_centroids",
    """
WITH q AS (
  SELECT label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS e
  FROM embeddings
), flat AS (
  SELECT label, UNNEST(e) AS v, UNNEST(generate_series(1, len(e))) AS pos FROM q
)
SELECT label, CAST(pos AS INTEGER) AS pos,
       CAST(SUM(v) AS BIGINT) AS sum_e6,
       COUNT(*) AS n,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) / 1000000.0 AS centroid
FROM flat GROUP BY label, pos
""",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space via positional explode +
    exact integer sums -- the reduce step of a k-means/IVF coarse quantizer,
    expressed as one shuffle on (label, position)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.expr(sim.QUANT.format(col="embedding")).alias("e")
    )
    flat = emb.select("label", F.posexplode("e").alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).cast("int").alias("pos"), "v"
    )
    return flat.groupBy("label", "pos").agg(
        F.sum("v").alias("sum_e6"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias("centroid"),
    )



def _kmeans_cte(k: int | str = 8, iters: int = 3) -> str:
    """Unrolled-Lloyd DuckDB CTE prefix: the iteration count is a fixed
    hyperparameter, so the loop unrolls into ``iters`` chained CTE blocks
    (assign -> per-(cluster, pos) integer-mean update with empty clusters
    keeping their centroid) -- replaying operators.similarity.
    kmeans_quantizer value-for-value with no recursion.  Exposes
    ``assign_{iters}`` (vec_id, lst), plus ``e`` (quantized vectors) and
    ``norms`` for downstream tails.

    ``k`` may be an int literal or a SQL scalar expression string (e.g. a
    ``(SELECT ...)`` subquery) -- the seed CTE's LIMIT accepts both, which
    is how the corpus-scaled k ~ sqrt(N) variant stays oracle-replayable."""
    head = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
ee AS (
  SELECT vec_id, UNNEST(q) AS v, UNNEST(generate_series(0, len(q) - 1)) AS pos FROM e
),
norms AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm FROM ee GROUP BY vec_id),
seed AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
         FROM e ORDER BY vec_id LIMIT {k}),
cents_0 AS (
  SELECT s.j, ee.pos, ee.v AS cv FROM seed s JOIN ee ON ee.vec_id = s.vec_id
)"""
    blocks = []
    for i in range(1, iters + 1):
        p = i - 1
        blocks.append(f""",
cnorm_{p} AS (SELECT j, CAST(SUM(cv * cv) AS BIGINT) AS cnrm FROM cents_{p} GROUP BY j),
dot_{i} AS (
  SELECT ee.vec_id, c.j, CAST(SUM(ee.v * c.cv) AS BIGINT) AS dot
  FROM ee JOIN cents_{p} c ON c.pos = ee.pos
  GROUP BY ee.vec_id, c.j
),
assign_{i} AS (
  SELECT vec_id, j AS lst FROM (
    SELECT d.vec_id, d.j,
           ROW_NUMBER() OVER (PARTITION BY d.vec_id
                              ORDER BY n.nrm - 2 * d.dot + c.cnrm, d.j) AS rk
    FROM dot_{i} d
    JOIN norms n ON n.vec_id = d.vec_id
    JOIN cnorm_{p} c ON c.j = d.j
  ) WHERE rk = 1
),
cstats_{i} AS (
  SELECT a.lst AS j, ee.pos, CAST(SUM(ee.v) AS BIGINT) // COUNT(*) AS m
  FROM assign_{i} a JOIN ee ON ee.vec_id = a.vec_id
  GROUP BY a.lst, ee.pos
),
cents_{i} AS (
  SELECT p.j, p.pos, COALESCE(s.m, p.cv) AS cv
  FROM cents_{p} p LEFT JOIN cstats_{i} s ON s.j = p.j AND s.pos = p.pos
)""")
    return head + "".join(blocks)



def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    tail = f"""
SELECT CAST(lst AS INTEGER) AS ivf_list, COUNT(*) AS n_vectors
FROM assign_{iters} GROUP BY lst ORDER BY ivf_list
"""
    return _kmeans_cte(k, iters) + tail



def _semdedup_oracle(k: int = 8, iters: int = 3, threshold: float = 0.2) -> str:
    """SemDeDup oracle: the unrolled-Lloyd CTE prefix feeds a
    within-cluster pairwise cosine tail (cluster = blocking key, exactly
    like the Spark side's equi-join on the quantizer's list id)."""
    tail = f""",
cpairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign_{iters} a JOIN assign_{iters} b
    ON a.lst = b.lst AND a.vec_id < b.vec_id
),
pv AS (
  SELECT p.id_a, p.id_b, UNNEST(ea.q) AS av, UNNEST(eb.q) AS bv
  FROM cpairs p
  JOIN e ea ON ea.vec_id = p.id_a
  JOIN e eb ON eb.vec_id = p.id_b
),
dots AS (SELECT id_a, id_b, CAST(SUM(av * bv) AS BIGINT) AS dot FROM pv GROUP BY id_a, id_b),
dup AS (
  SELECT DISTINCT d.id_b AS vec_id
  FROM dots d
  JOIN norms na ON na.vec_id = d.id_a
  JOIN norms nb ON nb.vec_id = d.id_b
  WHERE CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) >= {threshold!r}
)
SELECT a.vec_id, CAST(a.lst AS INTEGER) AS cluster_id,
       CAST(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_dup
FROM assign_{iters} a LEFT JOIN dup ON dup.vec_id = a.vec_id
"""
    return _kmeans_cte(k, iters) + tail



@register("semantic_dedup_clusters", _semdedup_oracle(k=8, iters=3, threshold=0.2))
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-then-threshold semantic dedup,
    operators.similarity.semantic_dedup): train the coarse quantizer, block
    candidate pairs by cluster id, mark any vector whose cosine to a
    lower-id cluster-mate reaches 0.2 as a semantic duplicate.  The whole
    chain -- Lloyd training, assignment, pairwise cosine, keep-first policy
    -- is deterministic integer math, so the DuckDB oracle replays it
    value-for-value.

    TEACHING VARIANT: k is FIXED at 8, so within-cluster candidate pairs
    grow ~quadratically with the corpus (measured rehearsal exponent 1.03
    at 30x, SCALE_REHEARSAL.json).  The PRODUCTION path is
    :func:`semantic_dedup_scaled` (k = floor(sqrt(N)), exponent 0.67) --
    fixed-k exists to pin the algebra against a small, human-checkable
    oracle, not to run at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(emb, k=8, iters=3, threshold=0.2)


# k as a SQL scalar: floor(sqrt(N)) over the same corpus the seeds come
# from -- both engines take IEEE-double sqrt of the exact count, so the
# cluster count is bit-identical (Python math.sqrt and DuckDB sqrt are
# the same libm-class double op on an exact integer input)

_K_SQRT_SQL = "(SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) FROM e)"



@register("semantic_dedup_scaled", _semdedup_oracle(k=_K_SQRT_SQL, iters=3, threshold=0.2))
def semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the SCALE-PATH cluster count k = floor(sqrt(N)) -- the
    r8 mitigation (SCALE_MITIGATIONS.json: exponent 1.03 -> 0.64 at fixed
    k=8 vs sqrt-N) promoted to a first-class hash-gated query: with k ~
    sqrt(N) the expected within-cluster pair count is O(N^1.5 / N) per
    cluster and the candidate volume stays bounded as the corpus grows,
    which is how SemDeDup is actually run on web-scale corpora (Abbas et
    al. 2023 use ~sqrt-scale cluster counts for the same reason).  N is
    one bounded driver scalar (a count); the oracle computes the SAME k
    inside SQL with a LIMIT subquery, so training, assignment, and the
    keep-first dedup all replay value-for-value at ANY corpus size."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    k = int(math.floor(math.sqrt(emb.count())))
    return sim.semantic_dedup(emb, k=k, iters=3, threshold=0.2)



@register(
    "semantic_dedup_scaled_bcast",
    _semdedup_oracle(k=_K_SQRT_SQL, iters=3, threshold=0.2),
)
def semantic_dedup_scaled_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup_scaled with the BROADCAST-CENTROID assignment path
    FORCED (operators.similarity.ivf_assign centroid_path='data'): the
    k ~ sqrt(N) plan a real corpus takes, where folding k x dim centroid
    ints into the expression tree would not survive analysis (r11's one
    `weak` mark).  Centroids travel as a one-row broadcast relation and
    the argmin is a higher-order transform -- identical exact integer
    math, identical lowest-index tie-break, O(1) plan size.  At test
    corpus sizes auto-switching would pick the literal path (k < 256),
    so this twin pins the scale path under the driver's hash gate with
    the SAME DuckDB oracle (the oracle replays arithmetic, not plan
    shape); tests/test_fold_guard.py additionally proves path equality
    and bounded k=1000 analysis."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    k = int(math.floor(math.sqrt(emb.count())))
    return sim.semantic_dedup(emb, k=k, iters=3, threshold=0.2, centroid_path="data")



@register(
    "incremental_semdedup_stream",
    _semdedup_oracle(k=_K_SQRT_SQL, iters=1, threshold=0.2),
)
def incremental_semdedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SemDeDup (streaming.stream.run_incremental_semdedup):
    embeddings replayed as TWO id-ordered micro-batches against a FROZEN
    coarse quantizer; per batch, cluster-blocked candidate pairs against
    the accreted vector store + the batch itself, exact integer cosine,
    keep-first by lowest id.  The union of emitted batches is checked
    row-for-row against the SAME unrolled-Lloyd DuckDB oracle family as
    semantic_dedup_scaled (k = floor(sqrt(N)), the scale-path cluster
    count) -- stream == batch == oracle.

    The frozen codebook is the SEED centroid set (first k vectors by id,
    the ivf_topk seeding idiom; oracle assign_1 uses cents_0 = seeds):
    Lloyd training itself is already triple-gated by the batch semdedup
    queries, so the stream twin spends its budget gating what is NEW here
    -- the cross-batch store protocol and election.  Deployment shape:
    codebook trained/frozen offline, ingest only assigns against it.
    Drops are id-ordered (low half first, file mtimes pinned
    so the file source replays them in order) because keep-first
    elections are id-ordered -- the runner's high-water-mark guard
    raises on out-of-order ids rather than silently diverging."""
    import os as _os
    import glob as _glob

    from odp_dynamic_data_pipeline_spark.queries.core import (
        _stream_shuffle,
        _stream_tmpdir,
    )
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_incremental_semdedup,
    )

    import math as _math

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # scale-path cluster count (see semantic_dedup_scaled): k ~ sqrt(N)
    # keeps within-cluster candidate pairs bounded as the corpus grows
    k = int(_math.floor(_math.sqrt(emb.count())))
    # broadcast-centroid assignment everywhere: at k ~ sqrt(N) the literal
    # path folds k x dim ints into every assignment plan; the data path is
    # the shape that survives real corpus sizes and is fold-guard gated.
    # iters=0 = seeds only (assign_1 in the oracle assigns vs cents_0)
    cents, _ = sim.kmeans_quantizer(
        emb, k=k, iters=0, assign=False, centroid_path="data"
    )
    tmp = _stream_tmpdir("inc_semdedup_stream")
    src = f"{tmp}/in"
    rng = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    mid = (int(rng["lo"]) + int(rng["hi"])) // 2
    (
        emb.withColumn("drop", (F.col("vec_id") > F.lit(mid)).cast("int"))
        .coalesce(1)
        .write.partitionBy("drop")
        .mode("overwrite")
        .parquet(src)
    )
    # the file source orders files by modification time: pin drop=0 older
    # so the low-id half is ALWAYS the first micro-batch
    for i, d in enumerate(("drop=0", "drop=1")):
        for p in _glob.glob(f"{src}/{d}/*.parquet"):
            _os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/drop=*")
    )
    with _stream_shuffle(spark):
        run_incremental_semdedup(
            stream,
            f"{tmp}/store",
            f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            centroids=cents,
            threshold=0.2,
            centroid_path="data",
        )
    return spark.read.parquet(f"{tmp}/out").select("vec_id", "cluster_id", "is_dup")



def _kcenter_oracle(k: int = 8) -> str:
    """Unrolled farthest-point-traversal replay: per round, a positional
    UNNEST zip computes the exact squared quantized distance to the new
    center and LEAST folds it into the running min (the unrolled-Lloyd
    pattern of _kmeans_oracle)."""
    ctes = [
        """e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
)""",
        "c1 AS (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT 1)",
        """pv1 AS (SELECT v.vec_id, UNNEST(v.q) AS av, UNNEST(c.q) AS bv
  FROM e v CROSS JOIN c1 c WHERE v.vec_id <> c.vec_id)""",
        "rem1 AS (SELECT vec_id, CAST(SUM((av - bv) * (av - bv)) AS BIGINT) AS mind2 FROM pv1 GROUP BY vec_id)",
    ]
    for t in range(2, k + 1):
        ctes.append(
            f"pick{t} AS (SELECT r.vec_id, e.q, r.mind2 FROM rem{t - 1} r"
            f" JOIN e USING (vec_id) ORDER BY r.mind2 DESC, r.vec_id LIMIT 1)"
        )
        if t < k:
            ctes.append(
                f"""pv{t} AS (SELECT r.vec_id, r.mind2, UNNEST(e.q) AS av, UNNEST(p.q) AS bv
  FROM rem{t - 1} r JOIN e USING (vec_id) CROSS JOIN pick{t} p WHERE r.vec_id <> p.vec_id)"""
            )
            ctes.append(
                f"rem{t} AS (SELECT vec_id, LEAST(MAX(mind2),"
                f" CAST(SUM((av - bv) * (av - bv)) AS BIGINT)) AS mind2"
                f" FROM pv{t} GROUP BY vec_id)"
            )
    tail = "SELECT CAST(1 AS INTEGER) AS sel_order, vec_id, CAST(0 AS BIGINT) AS d2 FROM c1"
    for t in range(2, k + 1):
        tail += f"\nUNION ALL SELECT CAST({t} AS INTEGER), vec_id, mind2 FROM pick{t}"
    return "WITH " + ",\n".join(ctes) + "\n" + tail



@register("kcenter_coreset_trace", _kcenter_oracle(8))
def kcenter_coreset_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (operators.similarity.
    kcenter_coreset, Gonzalez farthest-point 2-approximation): the
    DIVERSITY-pruning pick next to SemDeDup's redundancy removal and
    DSIR's target reweighting -- 8 maximally-covering exemplar vectors,
    each round one distributed least/argmax pass with the new center
    folded to a JVM constant and a single-row TakeOrdered collect.  The
    returned trace (selection order + distance-to-selected-set) is the
    elbow curve for choosing k; the DuckDB oracle replays all 8 unrolled
    rounds value-for-value."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.kcenter_coreset(emb, k=8)



@register("kmeans_ivf_lists", _kmeans_oracle(k=8, iters=3))
def kmeans_ivf_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained coarse quantizer: 3 Lloyd iterations over quantized
    embeddings, then the per-cluster membership census.  Deterministic
    (seeded centroids, lowest-id tie-breaks, exact integer means), so the
    unrolled-Lloyd DuckDB oracle verifies the whole training loop."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = sim.kmeans_quantizer(emb, k=8, iters=3)
    return (
        assigned.groupBy(F.col("ivf_list").cast("int").alias("ivf_list"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("ivf_list")
    )



IVF_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS j, e.q AS cq, n.nrm AS cnrm
  FROM e JOIN norms n ON n.vec_id = e.vec_id
  ORDER BY e.vec_id LIMIT 8
),
vc AS (
  SELECT e.vec_id, c.j, UNNEST(e.q) AS v, UNNEST(c.cq) AS cv FROM e, cents c
),
vcd AS (SELECT vec_id, j, CAST(SUM(v * cv) AS BIGINT) AS dot FROM vc GROUP BY vec_id, j),
dist AS (
  SELECT d.vec_id, d.j, n.nrm - 2 * d.dot + c.cnrm AS d2
  FROM vcd d JOIN norms n ON n.vec_id = d.vec_id JOIN cents c ON c.j = d.j
),
cand_assign AS (
  SELECT vec_id, j AS lst FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk FROM dist
  ) WHERE rk = 1
),
qry_assign AS (
  SELECT vec_id, j AS lst FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk
    FROM dist WHERE vec_id < 10
  ) WHERE rk <= 2
),
pairs AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cand_id
  FROM qry_assign q JOIN cand_assign c ON c.lst = q.lst
  WHERE c.vec_id <> q.vec_id
),
pv AS (
  SELECT p.qid, p.cand_id, UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM pairs p JOIN e qe ON qe.vec_id = p.qid JOIN e ce ON ce.vec_id = p.cand_id
),
dots AS (SELECT qid, cand_id, CAST(SUM(qv * cv) AS BIGINT) AS dot FROM pv GROUP BY qid, cand_id),
scored AS (
  SELECT d.qid, d.cand_id,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, rank, cosine FROM (
  SELECT qid, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
"""



@register("similarity_ivf_topk", IVF_TOPK_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (deterministically seeded coarse
    quantizer; assignment is a shuffle-free JVM map, probing an equi-join).
    Fully deterministic -- seed centroids are the first nlist vectors by id,
    assignment ties break to the lowest list id -- so the DuckDB oracle
    replays the ENTIRE two-stage ANN (assign -> probe -> exact re-rank)
    value-for-value, not just a rows-only check."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5, nlist=8, nprobe=2)



def _lsh_topk_oracle(tables: int = 8, planes: int = 4, dim: int = 64, k: int = 5) -> str:
    """Value-for-value DuckDB replay of the WHOLE SRP-LSH pipeline.

    The production hyperplanes are sign vectors derived from
    xxhash64(plane, j) -- but operators.similarity folds them in as plan
    LITERALS (the matrix is a constant), so the oracle embeds the SAME
    +/-1 literals via the Python xxhash64 replication and never needs the
    hash: bucket_t = sum_p [dot(q, s_{t,p}) > 0] * 2^p, candidates = the
    (table, bucket) equi-join, then the exact integer-quantized cosine
    re-rank shared with the IVF/PQ oracles.  This closes the last ANN
    rows-only gap: the xxhash64 perf path itself is now hash-gated."""
    from odp_dynamic_data_pipeline_spark.functions.xxh import xxhash64_ints

    def signs(plane: int) -> str:
        return (
            "["
            + ",".join(
                "1" if xxhash64_ints(plane, j) % 2 == 0 else "-1" for j in range(dim)
            )
            + "]::BIGINT[]"
        )

    per_table = []
    for t in range(tables):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(q, {signs(t * planes + p)}) > 0"
            f" THEN {2 ** p} ELSE 0 END)"
            for p in range(planes)
        )
        per_table.append(f"  SELECT vec_id, {t} AS tb, {terms} AS bk FROM e")
    buckets = "\n  UNION ALL\n".join(per_table)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
buckets AS (
{buckets}
),
pairs AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cand_id
  FROM buckets q JOIN buckets c ON c.tb = q.tb AND c.bk = q.bk
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
),
pv AS (
  SELECT p.qid, p.cand_id, UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM pairs p JOIN e qe ON qe.vec_id = p.qid JOIN e ce ON ce.vec_id = p.cand_id
),
dots AS (SELECT qid, cand_id, CAST(SUM(qv * cv) AS BIGINT) AS dot FROM pv GROUP BY qid, cand_id),
scored AS (
  SELECT d.qid, d.cand_id,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, rank, cosine FROM (
  SELECT qid, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""



@register("similarity_lsh_topk", _lsh_topk_oracle())
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed approximate top-k (scale path for
    similarity search: equi-join on bucket replaces the cross join).
    Full value-for-value oracle: the hyperplane sign matrix is a plan
    literal, so DuckDB replays bucketing + candidate join + exact
    re-rank exactly (see _lsh_topk_oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5)



@register(
    "embedding_quantize_int8",
    """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
         embedding
  FROM embeddings
),
c AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0.0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS INT)) END AS codes
  FROM q
)
SELECT vec_id, scale,
       md5(array_to_string(codes, ',')) AS codes_md5,
       CAST(list_sum(list_transform(codes, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS codes_l2,
       CAST(len(list_filter(codes, x -> abs(x) = 127)) AS BIGINT) AS n_sat
FROM c
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 vector compression (operators.similarity.quantize_int8),
    verified cross-engine by fingerprinting the code arrays (md5) plus
    exact integer invariants (L2 of codes, saturation count).  Map-only:
    no shuffle, no Python."""
    e = sim.quantize_int8(load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    return e.select(
        "vec_id",
        "scale",
        F.md5(F.array_join("codes", ",")).alias("codes_md5"),
        F.expr(
            "aggregate(transform(codes, x -> CAST(x AS BIGINT) * x), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("codes_l2"),
        F.expr("CAST(size(filter(codes, x -> abs(x) = 127)) AS BIGINT)").alias("n_sat"),
    )



def _pq_topk_oracle(*, m: int = 8, k: int = 16, dsub: int = 8, shortlist: int = 64, topk: int = 5, q_max: int = 20) -> str:
    """DuckDB replay of the ENTIRE pq_topk pipeline with md5-derived
    codebooks: encode (per-subspace argmin), per-query ADC tables, approx
    distance via code lookups, shortlist cut, exact cosine re-rank.  The
    codebooks are the same literals the Spark side folds into codegen
    (operators.similarity.pq_md5_codebooks), so every stage is integer-exact
    on both engines."""
    books = sim.pq_md5_codebooks(m=m, k=k, dsub=dsub)
    cb_rows = ",\n         ".join(
        f"({s}, {j}, [{', '.join(str(x) for x in books[s][j])}])"
        for s in range(m)
        for j in range(k)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
cb AS (
  SELECT * FROM (VALUES {cb_rows}) AS t(s, j, cq)
),
sub AS (
  SELECT e.vec_id, cb.s, cb.j,
         UNNEST(list_slice(e.q, cb.s * {dsub} + 1, (cb.s + 1) * {dsub})) AS v,
         UNNEST(cb.cq) AS cv
  FROM e, cb
),
d2 AS (
  SELECT vec_id, s, j, CAST(SUM((v - cv) * (v - cv)) AS BIGINT) AS dist
  FROM sub GROUP BY vec_id, s, j
),
codes AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT vec_id, s, j, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rk
    FROM d2
  ) WHERE rk = 1
),
approx AS (
  SELECT qd.vec_id AS qid, c.vec_id AS cand_id, SUM(qd.dist) AS approx_d2
  FROM codes c JOIN d2 qd ON qd.s = c.s AND qd.j = c.code
  WHERE qd.vec_id < {q_max} AND c.vec_id <> qd.vec_id
  GROUP BY qid, cand_id
),
short AS (
  SELECT qid, cand_id FROM (
    SELECT qid, cand_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx_d2, cand_id) AS rk
    FROM approx
  ) WHERE rk <= {shortlist}
),
pv AS (
  SELECT p.qid, p.cand_id, UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM short p JOIN e qe ON qe.vec_id = p.qid JOIN e ce ON ce.vec_id = p.cand_id
),
dots AS (SELECT qid, cand_id, CAST(SUM(qv * cv) AS BIGINT) AS dot FROM pv GROUP BY qid, cand_id),
scored AS (
  SELECT d.qid, d.cand_id,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, rank, cosine FROM (
  SELECT qid, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= {topk}
"""



@register("similarity_pq_topk", _pq_topk_oracle())
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators.similarity.pq_topk): md5-derived
    engine-portable codebooks, constant-folded encode (map-only), ADC
    scoring via per-pair table lookups, percentile-cutoff partial top-k,
    exact re-rank of the shortlist.  The DuckDB oracle replays every stage
    value-for-value (codebooks are shared literals), so the full ADC
    pipeline sits behind the hash gate; the sample-TRAINED codebook path
    (pq_train) stays covered by the recall floors in
    tests/test_similarity.py and the Lloyd-replay oracle of
    kmeans_ivf_lists."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    return sim.pq_topk(emb, q, k=5, shortlist=64, codebooks=sim.pq_md5_codebooks())



@register(
    "embedding_split_drift",
    r"""
WITH h AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS half
  FROM embeddings
),
n AS (SELECT label, half, COUNT(*) AS n FROM h GROUP BY label, half),
dims AS (SELECT label, half, i, qv[i] AS v
         FROM (SELECT label, half, qv, UNNEST(generate_series(1, len(qv))) AS i FROM h)),
s AS (SELECT label, half, i, CAST(SUM(v) AS BIGINT) AS s FROM dims GROUP BY label, half, i),
m AS (SELECT s.label, s.i, s.half, s.s // n.n AS m, n.n AS n FROM s JOIN n USING (label, half)),
j AS (SELECT a.label, a.i, a.m AS ma, b.m AS mb, a.n AS n_a, b.n AS n_b
      FROM m a JOIN m b ON a.label = b.label AND a.i = b.i AND a.half = 0 AND b.half = 1)
SELECT CAST(label AS BIGINT) AS label,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(SUM((ma - mb) * (ma - mb)) AS BIGINT) AS drift_d2
FROM j GROUP BY label
""",
)
def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-pipeline stability check: split each label's vectors into
    two deterministic halves (md5 parity of vec_id -- retry- and
    engine-stable, no rand()), compare the per-half centroids, and report
    the squared L2 distance between them in integer micro-units.  A healthy
    embedding pipeline shows near-zero drift between random halves; a large
    drift_d2 for one label flags batch effects (encoder version skew,
    truncation changes) before those vectors poison a dedup or retrieval
    pass.

    Per-dim sums aggregate exploded (label, half, dim) keys -- partial
    map-side combine collapses the 64x fan-out before the shuffle; the
    half-vs-half join runs on |labels| x 64 rows.  Centroid components are
    truncating integer divisions, identical in both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    h = emb.select(
        "label",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("qv"),
        F.expr(
            "CAST(conv(substr(md5(cast(vec_id as string)), 1, 8), 16, 10) AS BIGINT) % 2"
        ).alias("half"),
    )
    n = h.groupBy("label", "half").agg(F.count(F.lit(1)).alias("n"))
    dims = h.select("label", "half", F.posexplode("qv").alias("i", "v"))
    s = dims.groupBy("label", "half", "i").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).cast("long").alias("s")
    )
    m = s.join(n, ["label", "half"]).select(
        "label", "i", "half", F.expr("s div n").alias("m"), "n"
    )
    a = m.where(F.col("half") == 0).select(
        "label", "i", F.col("m").alias("ma"), F.col("n").alias("n_a")
    )
    b = m.where(F.col("half") == 1).select(
        "label", "i", F.col("m").alias("mb"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, ["label", "i"])
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))
            .cast("long")
            .alias("drift_d2"),
        )
    )



@register(
    "topic_doc_assignment",
    """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS e
  FROM embeddings
),
flat AS (SELECT vec_id, UNNEST(e) AS v, UNNEST(generate_series(1, len(e))) AS pos FROM q),
lq AS (
  SELECT label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS e
  FROM embeddings
),
lf AS (SELECT label, UNNEST(e) AS v, UNNEST(generate_series(1, len(e))) AS pos FROM lq),
cent AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) // COUNT(*) AS c FROM lf GROUP BY label, pos),
d AS (
  SELECT f.vec_id, c.label, CAST(SUM((f.v - c.c) * (f.v - c.c)) AS BIGINT) AS d2
  FROM flat f JOIN cent c USING (pos) GROUP BY f.vec_id, c.label
),
best AS (
  SELECT vec_id, label, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
  FROM d
)
SELECT doc.doc_id, doc.lang, CAST(b.label AS INTEGER) AS topic, b.d2
FROM best b JOIN documents doc ON doc.doc_id = b.vec_id
WHERE b.rn = 1
""",
)
def topic_doc_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topical curation: assign every document to its nearest label
    centroid in embedding space (operators.similarity.centroid_assign_exact)
    and carry the exact integer distance -- the join-the-modalities pass a
    topic-balanced 100 TB mixture needs (documents <-> embeddings by id).

    Centroid training is one (label, pos) aggregation collected to k x dim
    driver constants (truncating integer means, engine-portable);
    assignment is then a zero-shuffle JVM map over the embedding scan, and
    the only corpus-scale shuffle is the id equi-join to documents."""
    emb = sim.quantized(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    )
    stats = (
        emb.select("label", F.posexplode("qvec").alias("pos0", "v"))
        .groupBy("label", "pos0")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_label: dict[int, dict[int, int]] = {}
    for r in stats:
        s, n = int(r["s"]), int(r["n"])
        # truncate toward zero like Spark div / DuckDB // (Python // floors)
        by_label.setdefault(int(r["label"]), {})[int(r["pos0"])] = (
            -((-s) // n) if s < 0 else s // n
        )
    labels = sorted(by_label)
    cents = [[by_label[l][p] for p in sorted(by_label[l])] for l in labels]
    label_arr = F.array(*[F.lit(int(l)) for l in labels])
    assigned = sim.centroid_assign_exact(emb, cents).select(
        F.col("vec_id").alias("doc_id"),
        # centroid index -> label value (robust to non-contiguous labels)
        F.element_at(label_arr, F.col("topic") + 1).cast("int").alias("topic"),
        "d2",
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return docs.join(assigned, "doc_id").select("doc_id", "lang", "topic", "d2")



def _two_level_cte(k_sql: str) -> str:
    """Shared unrolled two-level-assignment CTE prefix (through ``pmd``;
    see topic_assign_two_level): parameterized over the cluster-count
    scalar so both the sqrt(N) assignment query and the constant-
    cluster-size linear SemDeDup reuse one replay."""
    return """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
kk AS ({k_sql}),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, q
  FROM e ORDER BY vec_id LIMIT (SELECT k FROM kk)
),
sup AS (SELECT j AS s, q FROM cents WHERE j < (SELECT CAST(ceil(sqrt(k)) AS BIGINT) FROM kk)),
cgp AS (SELECT c.j, s.s, UNNEST(c.q) AS cv, UNNEST(s.q) AS sv FROM cents c CROSS JOIN sup s),
cgd AS (SELECT j, s, CAST(SUM((cv - sv) * (cv - sv)) AS BIGINT) AS d2 FROM cgp GROUP BY j, s),
cgrp AS (
  SELECT j, s FROM (
    SELECT j, s, ROW_NUMBER() OVER (PARTITION BY j ORDER BY d2, s) AS rk FROM cgd
  ) WHERE rk = 1
),
psp AS (SELECT e.vec_id, s.s, UNNEST(e.q) AS pv, UNNEST(s.q) AS sv FROM e CROSS JOIN sup s),
psd AS (SELECT vec_id, s, CAST(SUM((pv - sv) * (pv - sv)) AS BIGINT) AS d2 FROM psp GROUP BY vec_id, s),
pgrp AS (
  SELECT vec_id, s FROM (
    SELECT vec_id, s, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, s) AS rk FROM psd
  ) WHERE rk = 1
),
pm AS (
  SELECT p.vec_id, c.j, e.q AS pq, c.q AS cq
  FROM pgrp p JOIN cgrp cg ON cg.s = p.s JOIN cents c ON c.j = cg.j
  JOIN e ON e.vec_id = p.vec_id
),
pmu AS (SELECT vec_id, j, UNNEST(pq) AS pv, UNNEST(cq) AS cv FROM pm),
pmd AS (SELECT vec_id, j, CAST(SUM((pv - cv) * (pv - cv)) AS BIGINT) AS d2 FROM pmu GROUP BY vec_id, j)
""".format(k_sql=k_sql)


@register(
    "topic_assign_two_level",
    _two_level_cte("SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS k FROM e")
    + """SELECT vec_id, CAST(j AS INTEGER) AS topic, d2 FROM (
  SELECT vec_id, j, d2, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk FROM pmd
) WHERE rk = 1
""",
)
def topic_assign_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (super-centroid -> within-group exact) assignment at the
    scale-path cluster count k = floor(sqrt(N)) -- the COMPUTE-scaling
    complement of semantic_dedup_scaled_bcast's plan fix: O(2*sqrt(k))
    distances per point instead of O(k) (~70x fewer at k = 31623;
    operators.similarity.assign_two_level).  Deterministic at every
    stage (first-g supers by index, exact integer d2, ties to the lowest
    index twice), so the DuckDB oracle replays the approximate
    assignment value-for-value -- stage A is a bounded literal fold or
    the broadcast data path, stage B a single BroadcastHashJoin on the
    super id, no shuffle of the embedding scan."""
    import math

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = sim.quantized(emb, "embedding")
    k = int(math.floor(math.sqrt(emb.count())))
    cents = [r["qvec"] for r in q.orderBy("vec_id").limit(k).select("qvec").collect()]
    # pass only (id, qvec, qnorm): the Arrow assignment stage is opaque to
    # column pruning, so an unpruned frame would ship the raw embedding
    # doubles through the Python boundary for nothing (guide §4.1; qnorm
    # stays because the small-k SQL path's ivf_assign formula needs it)
    return sim.assign_two_level(q.select("vec_id", "qvec", "qnorm"), cents).select(
        "vec_id", F.col("topic").cast("int").alias("topic"), "d2"
    )





def _semdedup_linear_oracle(c: int = 25, threshold: float = 0.2) -> str:
    """Linear-scale SemDeDup oracle: the two-level-assignment CTE at the
    CONSTANT-cluster-size count k = ceil(N / c), then the same
    within-cluster cosine keep-first tail as _semdedup_oracle."""
    tail = """,
asg2 AS (
  SELECT vec_id, j, d2 FROM (
    SELECT vec_id, j, d2, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk FROM pmd
  ) WHERE rk = 1
),
norms AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
          FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id),
cpairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg2 a JOIN asg2 b ON a.j = b.j AND a.vec_id < b.vec_id
),
pv AS (
  SELECT p.id_a, p.id_b, UNNEST(ea.q) AS av, UNNEST(eb.q) AS bv
  FROM cpairs p JOIN e ea ON ea.vec_id = p.id_a JOIN e eb ON eb.vec_id = p.id_b
),
dots AS (SELECT id_a, id_b, CAST(SUM(av * bv) AS BIGINT) AS dot FROM pv GROUP BY id_a, id_b),
dup AS (
  SELECT DISTINCT d.id_b AS vec_id
  FROM dots d JOIN norms na ON na.vec_id = d.id_a JOIN norms nb ON nb.vec_id = d.id_b
  WHERE CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) >= __THR__
)
SELECT a.vec_id, CAST(a.j AS INTEGER) AS cluster_id,
       CAST(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_dup
FROM asg2 a LEFT JOIN dup ON dup.vec_id = a.vec_id
"""
    return (
        _two_level_cte(
            f"SELECT CAST(ceil(COUNT(*) / {c}.0) AS BIGINT) AS k FROM e"
        )
        + tail.replace("__THR__", repr(threshold))
    )


@register("semantic_dedup_linear", _semdedup_linear_oracle())
def semantic_dedup_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at CONSTANT expected cluster size (k = ceil(N/25)) with
    two-level assignment -- the LINEAR-scale shape the 100x rehearsal
    demanded: at k = floor(sqrt(N)) the within-cluster pair volume is
    k * (N/k)^2 / 2 = N^1.5 / 2, which the r13 100x rehearsal surfaced
    (semantic_dedup_scaled_bcast exponent 0.52 at 30x was overhead-
    flattered; 0.92 at 100x, headed to 1.5).  Holding cluster size at a
    CONSTANT c makes pair volume N*c/2 -- linear -- while two-level
    assignment keeps per-point work O(2*sqrt(k)) instead of O(k), so
    the whole pipeline scales ~N at any corpus size (receipt:
    semantic_dedup_linear__100x_r13 in SCALE_REHEARSAL.json).  This is
    how SemDeDup runs on web-scale corpora (cluster counts chosen for
    bounded cluster SIZE, not sqrt tradeoffs).  Bounded driver steps:
    the k x dim seed collect and assign_two_level's k x g grouping are
    both k-bounded (k = N/c keeps them 1/c of the corpus; at true 100 TB
    the grouping itself becomes one extra Spark job, per the operator
    docstring).  Fully deterministic; the DuckDB oracle replays the
    two-level assignment AND the election value-for-value."""
    import math

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = sim.quantized(emb, "embedding")
    k = int(math.ceil(emb.count() / 25.0))
    cents = [r["qvec"] for r in q.orderBy("vec_id").limit(k).select("qvec").collect()]
    # prune to (id, qvec, qnorm) before the opaque Arrow assignment stage
    # (guide §4.1: mapInArrow defeats column pruning)
    asg = sim.assign_two_level(q.select("vec_id", "qvec", "qnorm"), cents).select(
        "vec_id", F.col("topic").cast("int").alias("cluster_id"), "qvec", "qnorm"
    )
    a = asg.select(
        F.col("vec_id").alias("id_a"), "cluster_id",
        F.col("qvec").alias("qa"), F.col("qnorm").alias("na"),
    )
    b = asg.select(
        F.col("vec_id").alias("id_b"), "cluster_id",
        F.col("qvec").alias("qb"), F.col("qnorm").alias("nb"),
    )
    pairs = a.join(b, "cluster_id").where(F.col("id_a") < F.col("id_b"))
    dot = F.expr(sim.DOT.format(a="qa", b="qb"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    dup_ids = (
        pairs.select("id_b", cosine.alias("__c"))
        .where(F.col("__c") >= F.lit(0.2))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        asg.select("vec_id", "cluster_id")
        .join(dup_ids, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce("__dup", F.lit(0)).cast("int").alias("is_dup"),
        )
    )


@register(
    "hard_negative_mining",
    """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
pairs AS (
  SELECT qe.vec_id AS qid, ce.vec_id AS cand_id, CAST(ce.label AS BIGINT) AS cand_label,
         UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM e qe, e ce
  WHERE qe.vec_id < 10 AND ce.label <> qe.label
),
dots AS (SELECT qid, cand_id, cand_label, CAST(SUM(qv * cv) AS BIGINT) AS dot
         FROM pairs GROUP BY qid, cand_id, cand_label),
scored AS (
  SELECT d.qid, d.cand_id, d.cand_label,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.qid
  JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, cand_label, rank, cosine FROM (
  SELECT qid, cand_id, cand_label, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives (operators.similarity.hard_negatives):
    per query vector, the 5 most-similar DIFFERENT-label candidates --
    exact integer-cosine baseline the ANN-backed production path is
    measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=5)
    return out.withColumn("cand_label", F.col("cand_label").cast("long"))



@register(
    "embedding_random_projection",
    r"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
p AS (
  SELECT vec_id, label,
         list_transform(generate_series(0, 15), j ->
           list_sum(list_transform(generate_series(1, len(qv)), i ->
             qv[i] * (2 * (('0x' || substr(md5((i - 1) || '_' || j), 1, 1))::BIGINT % 2) - 1)))) AS proj
  FROM q
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       md5(array_to_string(proj, ',')) AS proj_md5,
       CAST(list_sum(list_transform(proj, x -> x * x)) AS BIGINT) AS proj_l2
FROM p
""",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic JL dimensionality reduction (operators.similarity.
    random_projection): 64 -> 16 dims through a Rademacher matrix derived
    from md5 parities, verified cross-engine by fingerprinting the exact
    integer projection (md5 of the array + its L2).  Map-only, no shuffle --
    the pre-pass that shrinks every downstream ANN / clustering shuffle 4x."""
    e = sim.random_projection(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding"),
        out_dim=16,
        scale=10000,
        in_dim=64,
    )
    return e.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.md5(F.array_join("proj", ",")).alias("proj_md5"),
        F.expr(
            "aggregate(transform(proj, x -> x * x), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("proj_l2"),
    )



def _ivfpq_topk_oracle(
    *,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    kcent: int = 16,
    dsub: int = 8,
    shortlist: int = 64,
    topk: int = 5,
    q_max: int = 10,
) -> str:
    """DuckDB replay of the ENTIRE ivfpq_topk pipeline: coarse assignment
    (exact integer distances, first-nlist seed centroids), per-list
    residuals, residual PQ encode with the shared md5 codebooks, per-(query,
    probed-list) ADC tables, probed-list-only approx scoring, shortlist
    cut, exact cosine re-rank.  Same literals as the Spark side, so every
    stage is integer-exact on both engines."""
    books = sim.pq_md5_codebooks(m=m, k=kcent, dsub=dsub)
    cb_rows = ",\n         ".join(
        f"({s}, {j}, [{', '.join(str(x) for x in books[s][j])}])"
        for s in range(m)
        for j in range(kcent)
    )
    dim = m * dsub
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
  FROM (SELECT vec_id, UNNEST(q) AS v FROM e) GROUP BY vec_id
),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS j, e.q AS cq, n.nrm AS cnrm
  FROM e JOIN norms n ON n.vec_id = e.vec_id
  ORDER BY e.vec_id LIMIT {nlist}
),
cb AS (SELECT * FROM (VALUES {cb_rows}) AS t(s, j, cq)),
vc AS (SELECT e.vec_id, c.j, UNNEST(e.q) AS v, UNNEST(c.cq) AS cv FROM e, cents c),
vcd AS (SELECT vec_id, j, CAST(SUM(v * cv) AS BIGINT) AS dot FROM vc GROUP BY vec_id, j),
dist AS (
  SELECT d.vec_id, d.j, n.nrm - 2 * d.dot + c.cnrm AS d2
  FROM vcd d JOIN norms n ON n.vec_id = d.vec_id JOIN cents c ON c.j = d.j
),
cand_assign AS (
  SELECT vec_id, j AS lst FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk FROM dist
  ) WHERE rk = 1
),
qry_assign AS (
  SELECT vec_id, j AS lst FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk
    FROM dist WHERE vec_id < {q_max}
  ) WHERE rk <= {nprobe}
),
cres AS (
  SELECT a.vec_id, a.lst, i,
         e.q[i] - c.cq[i] AS rv,
         (i - 1) // {dsub} AS s, ((i - 1) % {dsub}) + 1 AS d
  FROM (SELECT vec_id, lst, UNNEST(generate_series(1, {dim})) AS i FROM cand_assign) a
  JOIN e ON e.vec_id = a.vec_id JOIN cents c ON c.j = a.lst
),
cd2 AS (
  SELECT r.vec_id, r.s, cb.j,
         CAST(SUM((r.rv - cb.cq[r.d]) * (r.rv - cb.cq[r.d])) AS BIGINT) AS dist
  FROM cres r JOIN cb ON cb.s = r.s
  GROUP BY r.vec_id, r.s, cb.j
),
codes AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT vec_id, s, j, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rk
    FROM cd2
  ) WHERE rk = 1
),
qres AS (
  SELECT a.vec_id, a.lst, i,
         e.q[i] - c.cq[i] AS rv,
         (i - 1) // {dsub} AS s, ((i - 1) % {dsub}) + 1 AS d
  FROM (SELECT vec_id, lst, UNNEST(generate_series(1, {dim})) AS i FROM qry_assign) a
  JOIN e ON e.vec_id = a.vec_id JOIN cents c ON c.j = a.lst
),
qdt AS (
  SELECT r.vec_id AS qid, r.lst, r.s, cb.j,
         CAST(SUM((r.rv - cb.cq[r.d]) * (r.rv - cb.cq[r.d])) AS BIGINT) AS dist
  FROM qres r JOIN cb ON cb.s = r.s
  GROUP BY r.vec_id, r.lst, r.s, cb.j
),
approx AS (
  SELECT qd.qid, c.vec_id AS cand_id, CAST(SUM(qd.dist) AS BIGINT) AS approx_d2
  FROM codes c
  JOIN cand_assign ca ON ca.vec_id = c.vec_id
  JOIN qdt qd ON qd.lst = ca.lst AND qd.s = c.s AND qd.j = c.code
  WHERE c.vec_id <> qd.qid
  GROUP BY qd.qid, c.vec_id
),
short AS (
  SELECT qid, cand_id FROM (
    SELECT qid, cand_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx_d2, cand_id) AS rk
    FROM approx
  ) WHERE rk <= {shortlist}
),
pv AS (
  SELECT p.qid, p.cand_id, UNNEST(qe.q) AS qv, UNNEST(ce.q) AS cv
  FROM short p JOIN e qe ON qe.vec_id = p.qid JOIN e ce ON ce.vec_id = p.cand_id
),
dots AS (SELECT qid, cand_id, CAST(SUM(qv * cv) AS BIGINT) AS dot FROM pv GROUP BY qid, cand_id),
scored AS (
  SELECT d.qid, d.cand_id,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nc.nrm AS DOUBLE)) AS cosine
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nc ON nc.vec_id = d.cand_id
)
SELECT qid, cand_id, rank, cosine FROM (
  SELECT qid, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= {topk}
"""



@register("similarity_ivfpq_topk", _ivfpq_topk_oracle())
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators.similarity.ivfpq_topk): coarse-list
    pruning by equi-join + residual PQ-ADC scoring + exact re-rank -- the
    FAISS IndexIVFPQ architecture as DataFrame ops, with no cross join in
    the plan.  Coarse centroids are first-nlist driver constants and the
    codebooks are the shared md5 literals, so the DuckDB oracle replays
    assignment, residuals, encode, ADC, shortlist, and re-rank
    value-for-value."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_topk(emb, emb.where(F.col("vec_id") < 10), k=5)



def _bm25_oracle(terms: list[str], k: int = 10) -> str:
    """BM25 oracle: idf log2 via the recursive-CTE fixed-point recurrence
    (the dsir-oracle pattern -- DuckDB's list_reduce fold mis-evaluates
    row-dependent init elements for some source vector layouts, erroring
    loudly on VALUES-sourced rows, so the per-term idf table uses the
    recursion instead)."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE t IN ({terms_sql}) GROUP BY doc_id, t
),
dfs AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY t),
vals AS (
  SELECT dfs.t, 'num' AS w, CAST(2 * stats.n - 2 * dfs.df + 1 AS BIGINT) AS x FROM dfs, stats
  UNION ALL
  SELECT dfs.t, 'den', CAST(2 * dfs.df + 1 AS BIGINT) FROM dfs, stats
),
lgr(t, w, it, e, m, frac) AS (
  SELECT t, w, 0, length(format('{{:b}}', x)) - 1,
         (x << 30) >> (length(format('{{:b}}', x)) - 1), CAST(0 AS BIGINT)
  FROM vals
  UNION ALL
  SELECT t, w, it + 1, e,
         CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
              THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END,
         frac * 2 + CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                         THEN 1 ELSE 0 END
  FROM lgr WHERE it < 20
),
lfp AS (SELECT t, w, (CAST(e AS BIGINT) << 20) + frac AS v FROM lgr WHERE it = 20),
idf AS (
  SELECT nv.t, nv.v - dv.v AS idf_fp
  FROM (SELECT t, v FROM lfp WHERE w = 'num') nv
  JOIN (SELECT t, v FROM lfp WHERE w = 'den') dv USING (t)
),
scored AS (
  SELECT tf.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(SUM(idf.idf_fp * ((1000000 * (44 * tf.tf * stats.avgdl))
              // (20 * tf.tf * stats.avgdl + 6 * stats.avgdl + 18 * dl.dl))) AS BIGINT) AS score_fp
  FROM tf
  JOIN idf ON idf.t = tf.t
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, n_hit_terms, score_fp FROM scored
ORDER BY score_fp DESC, doc_id LIMIT {{k}}
""".replace("{k}", str(k))



@register("bm25_retrieval", _bm25_oracle(["hash", "join", "fast", "dup"]))
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer BM25 lexical retrieval (operators.text.bm25_scores)
    for the query terms [hash, join, fast, dup]: Robertson idf through the
    fixed-point log2 recurrence on bounded driver constants, integer
    tf-saturation rational, top-10 by (score, doc_id).  The DuckDB oracle
    replays idf with the list_reduce log2 twin, so ranking AND scores are
    bit-identical -- the lexical half of a retrieval stack next to the
    ANN family."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tx.bm25_scores(docs, ["hash", "join", "fast", "dup"], k=10)



def arrow_embedding_norm_batches(batches):
    """mapInArrow kernel for ``mapinarrow_embedding_norms``: per-vector
    integer norm features over raw Arrow buffers.  Module-level (not a
    closure) so unit tests can feed it crafted batches -- empty lists,
    trailing-empty lists, and SLICED ListArrays are all exercised in
    tests/test_udfs.py."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        # zero-copy: read the ListArray's flat values + offsets buffers
        # directly into numpy and reduce per-list with reduceat -- one
        # vectorized pass, no per-row Python, no pandas/pydict boxing
        col = batch.column("embedding")
        lists = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if isinstance(lists, pa.LargeListArray | pa.ListArray):
            flat = lists.flatten()
            offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # pragma: no cover - fixed-size list fallback
            flat = lists.flatten()
            step = lists.type.list_size
            offs = np.arange(0, (len(lists) + 1) * step, step, dtype=np.int64)
        t = np.floor(flat.to_numpy(zero_copy_only=False).astype(np.float64) * 1_000_000).astype(
            np.int64
        )
        # offsets of a SLICED ListArray still index the parent's values
        # buffer while flatten() returns only the slice's values, so
        # rebase to the slice start before using them as flat indices
        starts = offs[:-1] - offs[0]
        empty = offs[1:] == offs[:-1]
        # reduceat quirks: an empty list at position i yields
        # t[starts[i]] (the next list's head), and a TRAILING empty list
        # puts len(t) in starts, which raises IndexError -- clamp first,
        # then zero the empty positions after the reduction
        safe = np.minimum(starts, max(len(t) - 1, 0))
        norm = np.add.reduceat(t * t, safe) if len(t) else np.zeros(len(safe), np.int64)
        csum = np.add.reduceat(t, safe) if len(t) else np.zeros(len(safe), np.int64)
        norm[empty] = 0
        csum[empty] = 0
        yield pa.record_batch(
            [
                batch.column("vec_id"),
                batch.column("label"),
                pa.array(norm, pa.int64()),
                pa.array(csum, pa.int64()),
            ],
            names=["vec_id", "label", "norm_sq_e12", "component_sum_e6"],
        )



@register(
    "mapinarrow_embedding_norms",
    """
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS t
  FROM embeddings
)
SELECT vec_id, label,
       CAST(list_sum(list_transform(t, y -> y * y)) AS BIGINT) AS norm_sq_e12,
       CAST(list_sum(t) AS BIGINT) AS component_sum_e6
FROM q
""",
)
def mapinarrow_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface: per-vector integer norm features computed on
    raw pyarrow RecordBatches -- the zero-copy sibling of mapInPandas (no
    pandas materialization, the Arrow buffers feed numpy directly), which
    is the right Python hook for numeric kernels over array columns.

    Determinism contract: float32 components are promoted to float64 and
    FLOORED at e6 (both IEEE ops bit-identical across engines -- floor has
    no round-half ambiguity, unlike rint vs ROUND), after which everything
    is int64.  The oracle replays the identical promote-floor-square
    pipeline in SQL list functions.  Per-batch work is vectorized numpy
    over Arrow buffers; at 100 TB this is a map-only stage, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.mapInArrow(
        arrow_embedding_norm_batches,
        "vec_id bigint, label int, norm_sq_e12 bigint, component_sum_e6 bigint",
    )



EVAL_QUERIES: dict[str, list[str]] = {
    # BIGRAM phrases: the corpus vocabulary is ~30 words each in ~78% of
    # docs (negative Robertson idf -- a degenerate unigram run), while
    # individual bigrams sit at 5-8% document frequency: positive idf,
    # >k relevant docs per query (recall@10 < 1), graded 0..2 gains.
    "q_hash_join": ["hash join", "join hash"],
    "q_scan_speed": ["fast scan", "slow scan"],
    "q_sort_merge": ["sort merge", "merge join"],
    "q_window_agg": ["window agg", "group key"],
}

# token derivation shared by the Spark operator call and the oracle: the
# adjacent-bigram phrase stream over lowercase unigrams

EVAL_TOKEN_SQL_SPARK = (
    "CASE WHEN size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) < 2"
    " THEN array()"
    " ELSE zip_with("
    "   slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 1,"
    "         size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) - 1),"
    "   slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 2,"
    "         size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) - 1),"
    "   (a, b) -> concat(a, ' ', b)) END"
)

EVAL_TOKEN_SQL_DUCK = (
    "list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+'))),"
    " i -> regexp_extract_all(lower(text), '[a-z0-9]+')[i] || ' ' ||"
    " regexp_extract_all(lower(text), '[a-z0-9]+')[i+1])"
)



def _retrieval_eval_oracle(queries: dict[str, list[str]], k: int = 10, rel_tf: int = 2) -> str:
    """Multi-query BM25 run + graded-relevance eval oracle: the bm25
    fixed-point idf recursion (same lgr CTE), a second log2 recursion for
    the nDCG rank discounts (ranks 1..k -- the identical fp20 values the
    Spark side broadcasts from ilog2_fp20), then pure-integer metric
    arithmetic.  Mirrors operators.ranking.retrieval_eval exactly."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    qt_values = ", ".join(
        f"('{qid}', '{t}')" for qid in sorted(queries) for t in queries[qid]
    )
    return f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, UNNEST({EVAL_TOKEN_SQL_DUCK}) AS t
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE t IN ({terms_sql}) GROUP BY doc_id, t
),
dfs AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY t),
vals AS (
  SELECT dfs.t, 'num' AS w, CAST(2 * stats.n - 2 * dfs.df + 1 AS BIGINT) AS x FROM dfs, stats
  UNION ALL
  SELECT dfs.t, 'den', CAST(2 * dfs.df + 1 AS BIGINT) FROM dfs, stats
),
lgr(t, w, it, e, m, frac) AS (
  SELECT t, w, 0, length(format('{{:b}}', x)) - 1,
         (x << 30) >> (length(format('{{:b}}', x)) - 1), CAST(0 AS BIGINT)
  FROM vals
  UNION ALL
  SELECT t, w, it + 1, e,
         CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
              THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END,
         frac * 2 + CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                         THEN 1 ELSE 0 END
  FROM lgr WHERE it < 20
),
lfp AS (SELECT t, w, (CAST(e AS BIGINT) << 20) + frac AS v FROM lgr WHERE it = 20),
idf AS (
  SELECT nv.t, nv.v - dv.v AS idf_fp
  FROM (SELECT t, v FROM lfp WHERE w = 'num') nv
  JOIN (SELECT t, v FROM lfp WHERE w = 'den') dv USING (t)
),
qt(query_id, t) AS (VALUES {qt_values}),
qd AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(SUM(idf.idf_fp * ((1000000 * (44 * tf.tf * stats.avgdl))
              // (20 * tf.tf * stats.avgdl + 6 * stats.avgdl + 18 * dl.dl))) AS BIGINT) AS score_fp,
         CAST(SUM(CASE WHEN tf.tf >= {rel_tf} THEN 1 ELSE 0 END) AS BIGINT) AS gain
  FROM tf
  JOIN qt ON qt.t = tf.t
  JOIN idf ON idf.t = tf.t
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
),
dvals AS (SELECT CAST(i AS BIGINT) AS r, CAST(i + 1 AS BIGINT) AS x FROM range(1, {k + 1}) t(i)),
dlgr(r, it, e, m, frac) AS (
  SELECT r, 0, length(format('{{:b}}', x)) - 1,
         (x << 30) >> (length(format('{{:b}}', x)) - 1), CAST(0 AS BIGINT)
  FROM dvals
  UNION ALL
  SELECT r, it + 1, e,
         CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
              THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END,
         frac * 2 + CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                         THEN 1 ELSE 0 END
  FROM dlgr WHERE it < 20
),
disc AS (
  SELECT r, (CAST(1 AS BIGINT) << 40) // ((CAST(e AS BIGINT) << 20) + frac) AS disc_fp
  FROM dlgr WHERE it = 20
),
run AS (
  SELECT query_id, doc_id, gain,
         row_number() OVER (PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rnk
  FROM qd QUALIFY rnk <= {k}
),
run_agg AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
         CAST(SUM(CASE WHEN gain >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
         CAST(COALESCE(MIN(CASE WHEN gain >= 1 THEN rnk END), 0) AS BIGINT) AS first_rel_rank,
         CAST(SUM(CASE WHEN gain >= 1 THEN gain * disc.disc_fp ELSE 0 END) AS BIGINT) AS dcg_fp
  FROM run JOIN disc ON disc.r = run.rnk GROUP BY query_id
),
ideal AS (
  SELECT query_id, CAST(SUM(gain * disc.disc_fp) AS BIGINT) AS idcg_fp FROM (
    SELECT query_id, gain,
           row_number() OVER (PARTITION BY query_id ORDER BY gain DESC, doc_id) AS rnk
    FROM qd WHERE gain >= 1 QUALIFY rnk <= {k}
  ) i JOIN disc ON disc.r = i.rnk GROUP BY query_id
),
totals AS (
  SELECT query_id, CAST(SUM(CASE WHEN gain >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_total
  FROM qd GROUP BY query_id
)
SELECT run_agg.query_id, n_retrieved,
       CAST(COALESCE(totals.n_rel_total, 0) AS BIGINT) AS n_rel_total,
       n_rel_topk, first_rel_rank,
       CAST(CASE WHEN first_rel_rank > 0 THEN 1000000 // first_rel_rank ELSE 0 END AS BIGINT) AS mrr_e6,
       CAST((1000000 * n_rel_topk) // {k} AS BIGINT) AS p_at_k_e6,
       CAST(CASE WHEN COALESCE(totals.n_rel_total, 0) > 0
                 THEN (1000000 * n_rel_topk) // totals.n_rel_total ELSE 0 END AS BIGINT) AS r_at_k_e6,
       CAST(CASE WHEN COALESCE(ideal.idcg_fp, 0) > 0
                 THEN (1000000 * dcg_fp) // ideal.idcg_fp ELSE 0 END AS BIGINT) AS ndcg_e6
FROM run_agg
LEFT JOIN totals USING (query_id)
LEFT JOIN ideal USING (query_id)
"""



@register("retrieval_eval_report", _retrieval_eval_oracle(EVAL_QUERIES, rel_tf=1))
def retrieval_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval evaluation (operators.ranking.retrieval_eval):
    a 4-query PHRASE-BM25 run (adjacent-bigram tokens -- the corpus's
    unigram vocabulary is too common for positive idf), scored against
    graded relevance labels that are INDEPENDENT of the ranker's exact
    arithmetic (gain = number of query phrases present), producing
    per-query nDCG@10 / MRR / P@10 / R@10 in exact integer arithmetic --
    the fp20 log2 discount table is the same fixed-point recurrence as
    the BM25 idf, so the DuckDB oracle replays every metric
    bit-for-bit.  One corpus pass serves all queries (shared tokenize +
    stats, a (query, phrase, idf) broadcast); per-query top-k goes
    through WindowGroupLimit, so partitions ship k rows, not hit sets."""
    from odp_dynamic_data_pipeline_spark.operators.ranking import retrieval_eval

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return retrieval_eval(
        docs, EVAL_QUERIES, k=10, rel_tf=1, token_sql=EVAL_TOKEN_SQL_SPARK
    )



def _rrf_oracle(terms: list[str], n_deep: int = 100, k: int = 10, c: int = 60) -> str:
    """RRF oracle: the bm25 scored CTE (same lgr idf recursion) and a
    length-normalized term-density ranking, each cut to its top-n_deep
    run, fused by summed reciprocal ranks in exact integers."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE t IN ({terms_sql}) GROUP BY doc_id, t
),
dfs AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY t),
vals AS (
  SELECT dfs.t, 'num' AS w, CAST(2 * stats.n - 2 * dfs.df + 1 AS BIGINT) AS x FROM dfs, stats
  UNION ALL
  SELECT dfs.t, 'den', CAST(2 * dfs.df + 1 AS BIGINT) FROM dfs, stats
),
lgr(t, w, it, e, m, frac) AS (
  SELECT t, w, 0, length(format('{{:b}}', x)) - 1,
         (x << 30) >> (length(format('{{:b}}', x)) - 1), CAST(0 AS BIGINT)
  FROM vals
  UNION ALL
  SELECT t, w, it + 1, e,
         CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
              THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END,
         frac * 2 + CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                         THEN 1 ELSE 0 END
  FROM lgr WHERE it < 20
),
lfp AS (SELECT t, w, (CAST(e AS BIGINT) << 20) + frac AS v FROM lgr WHERE it = 20),
idf AS (
  SELECT nv.t, nv.v - dv.v AS idf_fp
  FROM (SELECT t, v FROM lfp WHERE w = 'num') nv
  JOIN (SELECT t, v FROM lfp WHERE w = 'den') dv USING (t)
),
scored AS (
  SELECT tf.doc_id,
         CAST(SUM(idf.idf_fp * ((1000000 * (44 * tf.tf * stats.avgdl))
              // (20 * tf.tf * stats.avgdl + 6 * stats.avgdl + 18 * dl.dl))) AS BIGINT) AS score_fp
  FROM tf
  JOIN idf ON idf.t = tf.t
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
bmtop AS (SELECT doc_id, score_fp FROM scored ORDER BY score_fp DESC, doc_id LIMIT {n_deep}),
bmrun AS (SELECT doc_id, row_number() OVER (ORDER BY score_fp DESC, doc_id) AS rnk FROM bmtop),
dens AS (
  SELECT tf.doc_id,
         (1000000 * CAST(SUM(tf.tf) AS BIGINT)) // CAST(MAX(dl.dl) AS BIGINT) AS dscore
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id GROUP BY tf.doc_id
),
dtop AS (SELECT doc_id, dscore FROM dens ORDER BY dscore DESC, doc_id LIMIT {n_deep}),
drun AS (SELECT doc_id, row_number() OVER (ORDER BY dscore DESC, doc_id) AS rnk FROM dtop),
u AS (
  SELECT doc_id, 'bm25' AS sys, rnk FROM bmrun
  UNION ALL
  SELECT doc_id, 'density', rnk FROM drun
),
f AS (
  SELECT doc_id,
         CAST(MIN(CASE WHEN sys = 'bm25' THEN rnk END) AS BIGINT) AS rank_bm25,
         CAST(MIN(CASE WHEN sys = 'density' THEN rnk END) AS BIGINT) AS rank_density,
         CAST(SUM(1000000000 // ({c} + rnk)) AS BIGINT) AS rrf_e9
  FROM u GROUP BY doc_id
)
SELECT doc_id, rank_bm25, rank_density, rrf_e9
FROM f ORDER BY rrf_e9 DESC, doc_id LIMIT {k}
"""



@register("rrf_fusion_topk", _rrf_oracle(["hash", "join", "fast", "dup"]))
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion (operators.ranking.rrf_fuse): the
    BM25 run for [hash, join, fast, dup] fused with a length-normalized
    term-density run by reciprocal-rank fusion (1e9 // (60 + rank), the
    Cormack 2009 constant), exact integers end to end.  Each system is
    cut to its top-100 FIRST (TakeOrderedAndProject -- never a global
    sort), so the fusion aggregates 200 rows regardless of corpus size;
    the row_number that turns each bounded run into dense ranks is a
    global window over <= 100 rows by construction (GLOBAL_WINDOW_BOUNDED
    in the plan audit)."""
    from odp_dynamic_data_pipeline_spark.operators.ranking import rrf_fuse

    terms = ["hash", "join", "fast", "dup"]
    terms_arr = "array(" + ",".join(f"'{t}'" for t in terms) + ")"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    bm = tx.bm25_scores(docs, terms, k=100)
    run_a = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_fp").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rank"),
    )

    tok = docs.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("__t"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    dens = (
        tok.where(F.expr(f"array_contains({terms_arr}, __t)"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
        .join(dl, "doc_id")
        .select("doc_id", F.expr("(1000000 * __tf) div dl").alias("dscore"))
        .orderBy(F.col("dscore").desc(), F.col("doc_id").asc())
        .limit(100)
    )
    run_b = dens.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("dscore").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rank"),
    )
    return rrf_fuse({"bm25": run_a, "density": run_b}, id_col="doc_id", k=10, c=60)


