"""Similarity search over embedding columns (array<float>).

``cosine_topk`` is the exact brute-force baseline: quantize to integer
micro-units (deterministic across engines), dot products via
``zip_with``/``aggregate`` (JVM-side, no Python), rank per query.  The query
side broadcasts, so candidates never shuffle -- at 100 TB of candidates this
is a single scan.

``lsh_topk`` is the scale path: random-hyperplane LSH buckets candidates so
each query only scores its bucket's collisions (sub-linear candidate set),
then exact-scores survivors.  Hyperplanes are derived from xxhash64 -- no
stored model, fully deterministic.

Literature: sign-random-projection LSH (Charikar, STOC 2002; Indyk/Motwani,
STOC 1998 for the LSH framework); IVF coarse quantization (Jegou/Douze/
Schmid, "Product quantization for nearest neighbor search", TPAMI 2011 --
the inverted-file part, without PQ codes); Lloyd's k-means (1957/1982).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odp_dynamic_data_pipeline_spark.operators.partitioning import ensure_min_parallelism

QUANT = "transform({col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
NORM = "aggregate(transform({a}, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"


def quantized(df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec") -> DataFrame:
    # fan out first: a single-row-group embedding file scans as one
    # partition and would run all per-vector arithmetic on one core
    df = ensure_min_parallelism(df)
    df = df.withColumn(out_col, F.expr(QUANT.format(col=vec_col)))
    # qnorm is coalesce-wrapped to be NON-NULLABLE: a downstream filter
    # that implies qnorm IS NOT NULL (any cosine threshold does) would
    # otherwise be inferred and pushed into the embeddings scan with the
    # whole quantize+norm pipeline inlined as the predicate -- the
    # arithmetic evaluated twice per row (r13 plan audit,
    # embedding_neardup_by_label).  A null embedding still yields a null
    # qvec, so every dot/cosine against it stays null exactly as before.
    return df.withColumn(
        "qnorm", F.coalesce(F.expr(NORM.format(a=out_col)), F.lit(0).cast("bigint"))
    )


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.
    Returns (qid, cand_id, rank, cosine)."""
    cand = quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col)
    qry = quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col).select(
        "qid", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm")
    )
    pairs = cand.crossJoin(F.broadcast(qry)).where(F.col("cand_id") != F.col("qid"))
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    scored = pairs.select("qid", "cand_id", cosine.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "rank", "cosine")
    )


def hard_negatives(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    highest-cosine candidates whose label DIFFERS from the query's --
    the near-miss examples a retrieval/embedding model learns the most
    from (DPR, Karpukhin et al. 2020).

    Exact brute-force baseline (scan x broadcast queries), same integer
    dot/norm arithmetic as cosine_topk so any engine reproduces the
    ranking bitwise.  The 100 TB path swaps the cross join for
    lsh_topk/ivf_topk candidate generation and keeps the same
    different-label filter; this exact form is the recall oracle for it.
    Returns (qid, cand_id, cand_label, rank, cosine)."""
    cand = quantized(
        candidates.select(
            F.col(id_col).alias("cand_id"), F.col(label_col).alias("cand_label"), vec_col
        ),
        vec_col,
    )
    qry = quantized(
        queries.select(F.col(id_col).alias("qid"), F.col(label_col).alias("q_label"), vec_col),
        vec_col,
    ).select("qid", "q_label", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm"))
    pairs = cand.crossJoin(F.broadcast(qry)).where(F.col("cand_label") != F.col("q_label"))
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    scored = pairs.select("qid", "cand_id", "cand_label", cosine.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "cand_label", "rank", "cosine")
    )


def _const_vec(ints) -> F.Column:
    return F.array(*[F.lit(int(x)) for x in ints])


def _dot_const(vec_col: str, ints) -> F.Column:
    """<vec_col, constant vector> as exact bigint arithmetic."""
    arr = ",".join(str(int(x)) for x in ints)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({arr}), (x, y) -> x * y),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


# Above this many centroids, constant-folding the centroid set into the
# expression tree stops being a plan-size win and becomes a plan-size
# HAZARD: at k = floor(sqrt(N)) on a real corpus (N = 1e9 -> k ~ 31623,
# dim 64 -> ~2M literals) the analyzer chokes long before an executor sees
# a row.  Past the threshold the centroids travel as DATA -- one broadcast
# single-row relation carrying array<struct<j, cvec, cnorm>> -- and the
# argmin runs as a higher-order transform over that array: same exact
# integer math, same lowest-index tie-break, O(1) plan size, zero shuffle
# (BroadcastNestedLoopJoin against one row).  256 keeps every teaching-
# scale plan on the (marginally faster to analyze) literal path.
LITERAL_CENTROID_MAX = 256

# The AUTO-path crossover is far below the hazard ceiling: once the
# broadcast relation travels through Arrow (a JVM LocalRelation, not a
# pickled Python RDD -- r13 localrel fix), the data path beats the
# literal fold well before the plan becomes a hazard, because every
# literal-path iteration re-analyzes and re-codegens a k x dim-term
# expression while the data path's plan is O(1).  Measured at sf0.1
# (dim 64, 3 Lloyd iterations, alternating reps in one session):
# k=44 literal 5.3s vs data 2.8s; k=8 equal within noise (4.0 vs 3.8).
# 16 keeps the small teaching plans (k/nlist = 8) on the literal path
# and routes everything larger to the data path.  LITERAL_CENTROID_MAX
# above remains the plan-size HAZARD budget for forced-literal callers
# and the LSH/PQ fold guards.
LITERAL_CENTROID_AUTO = 16

# assign_two_level's centroid -> super grouping runs driver-side Python
# only while k * g * dim stays under this many elementary int ops; past
# it the grouping becomes one bounded Spark job (r13: at k=8000/dim=64
# the Python loop was 46M interpreted ops and dominated the query)
TWO_LEVEL_DRIVER_BUDGET = 5_000_000

# assign_two_level's per-point stages run as Arrow/numpy integer matmuls
# once k reaches this many centroids (r14, VERDICT r13 item 7 / guide
# §4.2): the SQL path evaluates O(g + k/g) interpreted higher-order
# zip_with/aggregate lambdas per point, and the r13 100x rehearsal
# measured that term LEADING semantic_dedup_linear's scaling exponent
# (0.789; assignment is O(N * sqrt(N/c) * dim) total).  The numpy path
# does the identical exact int64 arithmetic (same first-min = lowest-
# index tie-breaks) as two matmuls per batch, trading one JVM<->Python
# Arrow crossing for a ~vectorized constant.  Small k stays on the SQL
# path where plans are tiny and the Python boundary is the larger cost.
TWO_LEVEL_ARROW_MIN = 16


def _centroids_relation(spark, centroids: list[list[int]]):
    """One-row DataFrame carrying the centroid set as data: ``__cents``
    array<struct<j int, cvec array<bigint>, cnorm bigint>>, ordered by j
    so in-order folds tie-break to the lowest index exactly like the
    enumerate() order of the literal path."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    rows = [
        (j, [int(x) for x in c], sum(int(x) * int(x) for x in c))
        for j, c in enumerate(centroids)
    ]
    # non-nullable throughout so the data path's output schema matches the
    # literal path's (F.lit structs) exactly, nullability included
    cent_struct = StructType(
        [
            StructField("j", IntegerType(), False),
            StructField("cvec", ArrayType(LongType(), False), False),
            StructField("cnorm", LongType(), False),
        ]
    )
    schema = StructType(
        [StructField("__cents", ArrayType(cent_struct, False), False)]
    )
    # through pandas/Arrow, NOT a plain local list: a list-backed relation
    # scans via a pickled Python RDD, and every job touching it pays a
    # multi-second Python-worker round trip (measured ~5-8 s per execution
    # on local[32] -- r13; the Arrow path builds a JVM LocalRelation with
    # identical values and nullability)
    try:
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame({"__cents": [rows]}), schema)
    except Exception:  # pandas/Arrow unavailable -- correct but slower
        return spark.createDataFrame([(rows,)], schema)


def _ranked_over_cents(vec_col: str, *, metric: str) -> F.Column:
    """array<struct<d, j>> of (distance, centroid index) over a joined
    ``__cents`` column, ascending -- the data-path twin of the literal
    array_sort(array(struct...)) in ivf_assign / centroid_assign_exact.
    ``metric`` 'norm' computes |v|^2 - 2<v,c> + |c|^2 (needs a ``qnorm``
    column), 'l2' computes sum((a-b)^2) directly; both are the same exact
    BIGINT value, kept separate so each caller replays its oracle's
    formula verbatim."""
    if metric == "norm":
        d = (
            f"qnorm - 2 * aggregate(zip_with({vec_col}, c.cvec, (x, y) -> x * y),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x) + c.cnorm"
        )
    else:
        d = (
            f"aggregate(zip_with({vec_col}, c.cvec, (x, y) -> (x - y) * (x - y)),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return F.expr(
        f"array_sort(transform(__cents, c -> named_struct('d', {d}, 'j', c.j)))"
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "qvec",
    out_col: str = "ivf_list",
    nprobe: int = 1,
    centroid_path: str = "auto",
) -> DataFrame:
    """Assign each (quantized) vector to its nearest centroid(s) by exact
    integer distance: dist2 = |v|^2 - 2<v,c> + |c|^2.  ``nprobe=1`` yields a
    single list id; ``nprobe>1`` yields an array of the n nearest lists
    (query-side multi-probe).

    Centroids fold into the plan as literals up to LITERAL_CENTROID_AUTO;
    past that they ship as a broadcast one-row relation and the identical
    arithmetic runs as a transform over the array -- the k = sqrt(N)
    scale path (SemDeDup at web scale) where a plan-literal fold would
    not survive analysis.  ``centroid_path``: 'auto' switches on the
    threshold, 'literal' / 'data' force a path (the 'data' force is how
    semantic_dedup_scaled_bcast keeps the scale path hash-gated at test
    corpus sizes where auto would pick the literal path)."""
    use_data = (
        centroid_path == "data"
        or (centroid_path == "auto" and len(centroids) > LITERAL_CENTROID_AUTO)
    )
    # The scalar (nprobe=1) assignment is wrapped in coalesce(expr, -1) to
    # make the output column NON-NULLABLE (the getItem/getField chain is
    # nullable even though it never actually yields null for a non-empty
    # centroid set).  Without this, using the assignment as an inner-join
    # key makes InferFiltersFromConstraints add IsNotNull(<assignment>),
    # which predicate-pushdown inlines into the vector table's parquet
    # scan -- the ENTIRE quantize + k-distance argmin pipeline evaluated
    # a second time as a scan filter, below the parallelizing exchange
    # (r13 plan audit caught it in ivf/ivfpq topk and two-level assign).
    # coalesce never fires; values are bit-identical.
    if use_data:
        joined = df.crossJoin(
            F.broadcast(_centroids_relation(df.sparkSession, centroids))
        )
        ranked = _ranked_over_cents(vec_col, metric="norm")
        picked = (
            F.coalesce(ranked[0]["j"], F.lit(-1))
            if nprobe == 1
            else F.slice(ranked, 1, nprobe)["j"]
        )
        return joined.withColumn(out_col, picked).drop("__cents")
    entries = []
    for j, c in enumerate(centroids):
        c_norm = sum(int(x) * int(x) for x in c)
        dist2 = F.col("qnorm") - F.lit(2) * _dot_const(vec_col, c) + F.lit(c_norm)
        entries.append(F.struct(dist2.alias("d"), F.lit(j).alias("j")))
    ranked = F.array_sort(F.array(*entries))
    if nprobe == 1:
        return df.withColumn(out_col, F.coalesce(ranked[0]["j"], F.lit(-1)))
    return df.withColumn(out_col, F.slice(ranked, 1, nprobe)["j"])


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: candidates are bucketed into ``nlist``
    inverted lists by nearest centroid; each query exact-scores only the
    vectors in its ``nprobe`` nearest lists.

    Centroids here are the first ``nlist`` candidate vectors (deterministic
    seeding; swap in k-means output at will) -- they are driver-collected
    constants (nlist x dim ints), folded into the assignment expression, so
    assignment is a pure JVM map with NO join or shuffle.  At 100 TB this is
    the standard two-stage ANN: sub-linear candidate generation via the
    equi-join on list id, exact re-ranking only within probed lists."""
    cand = quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col)
    qry = quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col)

    cents = [
        row["qvec"]
        for row in cand.orderBy("cand_id").limit(nlist).select("qvec").collect()
    ]
    cand_l = ivf_assign(cand, cents, nprobe=1)
    qry_l = ivf_assign(qry, cents, nprobe=nprobe).select(
        "qid",
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
        F.explode("ivf_list").alias("ivf_list"),
    )
    pairs = cand_l.join(F.broadcast(qry_l), "ivf_list").where(F.col("cand_id") != F.col("qid"))
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    scored = pairs.select("qid", "cand_id", cosine.alias("cosine")).dropDuplicates(["qid", "cand_id"])
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "rank", "cosine")
    )


def kmeans_quantizer(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    centroid_path: str = "auto",
    assign: bool = True,
) -> tuple[list[list[int]], DataFrame | None]:
    """Deterministic mini k-means over quantized vectors -- the trained
    coarse quantizer for ivf_topk (which defaults to seed-only centroids).

    Lloyd iterations as DataFrame ops: assignment is the shuffle-free
    constant-centroid map (ivf_assign), the update is one groupBy on
    (cluster, position) with exact integer means; only k x dim ints hit the
    driver per iteration (the same driver-side centroid loop as MLlib).

    The quantized vector table feeds every iteration plus the seed probe
    and the returned assignment, so it is persisted for the duration --
    without the cache each Lloyd round re-reads and re-quantizes the
    source (iters + 3 full scans; at 100 TB the equivalent is writing the
    quantized table once).  The cache is released before returning; the
    returned assignment is materialized via localCheckpoint first so its
    lineage no longer references the unpersisted cache.

    Returns (centroids, assignment DataFrame with 'ivf_list' column);
    ``assign=False`` skips the final assignment materialization (its
    localCheckpoint is a full extra pass) and returns (centroids, None)
    -- the train-offline shape run_incremental_semdedup feeds on.
    """
    cand = quantized(df.select(F.col(id_col).alias("__id"), vec_col), vec_col).persist()
    # one seed collect serves both the centroids and the dim probe (a
    # separate first() would be one more blocking job on the cached table)
    cents = [row["qvec"] for row in cand.orderBy("__id").limit(k).select("qvec").collect()]
    dim = len(cents[0])
    assigned = None
    for _ in range(iters):
        assigned = ivf_assign(cand, cents, nprobe=1, centroid_path=centroid_path)
        stats = (
            assigned.select("ivf_list", F.posexplode("qvec").alias("pos", "v"))
            .groupBy("ivf_list", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep their centroid
        by_cluster: dict[int, list] = {}
        for r in stats:
            by_cluster.setdefault(r["ivf_list"], []).append(r)
        for cl, rows in by_cluster.items():
            vec = [0] * dim
            for r in rows:
                # exact integer mean, TRUNCATED toward zero (not floored):
                # SQL engines' integer division truncates, and the oracle
                # replays this loop -- Python's // floors, which diverges
                # on negative sums
                s, n = r["s"], r["n"]
                vec[r["pos"]] = -((-s) // n) if s < 0 else s // n
            new[cl] = vec
        cents = new
    if not assign:
        cand.unpersist()
        return cents, None
    result = assigned.withColumnRenamed("__id", id_col).localCheckpoint(eager=True)
    cand.unpersist()
    return cents, result


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.2,
    centroid_path: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space
    with the trained coarse quantizer (:func:`kmeans_quantizer`), then mark
    a vector as a semantic duplicate when a LOWER-id vector in the SAME
    cluster has cosine similarity >= ``threshold`` (greedy keep-first
    policy, deterministic).

    The cluster is the blocking key: candidate pairs are generated by an
    equi-join on the cluster id, never all-pairs -- at 100 TB the same
    shape runs with k ~ sqrt(N) clusters so the expected per-cluster pair
    count stays bounded, and the join shuffles only (id, cluster, qvec)
    rows.  PASS k ACCORDINGLY: a fixed small k makes within-cluster pairs
    grow quadratically with the corpus (rehearsal exponent 1.03 for the
    fixed-k=8 query vs 0.67 for k=floor(sqrt(N)), SCALE_REHEARSAL.json) --
    the production caller is queries/llm.py::semantic_dedup_scaled, which
    derives k from one bounded count() scalar.  Cosine is computed on exact integer micro-unit vectors (one
    zip_with/aggregate fold per surviving pair, JVM-side), so the whole
    pipeline -- training included -- replays bit-identically in the DuckDB
    oracle.

    Returns one row per input vector: (id_col, cluster_id, is_dup).
    """
    _, assigned = kmeans_quantizer(
        df, id_col=id_col, vec_col=vec_col, k=k, iters=iters, centroid_path=centroid_path
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        "ivf_list",
        F.col("qvec").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        "ivf_list",
        F.col("qvec").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    pairs = a.join(b, "ivf_list").where(F.col("id_a") < F.col("id_b"))
    dot = F.expr(DOT.format(a="qa", b="qb"))
    cosine = dot.cast("double") / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
    dup_ids = (
        pairs.select("id_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        assigned.select(id_col, F.col("ivf_list").cast("int").alias("cluster_id"))
        .join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce("__dup", F.lit(0)).cast("int").alias("is_dup"),
        )
    )


def _hyperplane_sign(vec_col: str, plane: int, dim: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[j] in {-1,+1} derives from
    xxhash64(plane, j) -- a deterministic random hyperplane.

    The sign vector depends only on (plane, j), so it is evaluated ONCE at
    plan-build time with the Python replication of Spark's xxhash64
    (functions/xxh.py, JVM-parity pinned by test) and folded in as a
    literal: the previous form re-ran xxhash64 per ROW per element --
    tables*planes*dim = 2048 hashes/row at the defaults, pure overhead at
    any scale since the matrix is a constant.  Bit-identical output: the
    multiply-by-sign accumulates through the same CAST-to-DOUBLE lambda."""
    from odp_dynamic_data_pipeline_spark.functions.xxh import xxhash64_ints

    signs = "array(" + ",".join(
        "1" if xxhash64_ints(plane, j) % 2 == 0 else "-1" for j in range(dim)
    ) + ")"
    terms = (
        f"aggregate(zip_with({vec_col}, {signs}, (x, s) -> x * s),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    )
    return (F.expr(terms) > 0).cast("int")


def lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multi-table random-hyperplane (SRP) LSH: ``tables`` independent
    signatures of ``planes_per_table`` bits each, exploded to one
    (table, bucket) row per table.

    A single wide signature has near-zero recall (all bits must match; at 8
    planes that's 1/256 buckets -- measured recall@5 was 0.02).  L smaller
    tables trade candidate volume for recall the standard way: a neighbor is
    found if it collides in ANY table."""
    # Hyperplane signs fold tables*planes*dim md5-derived literals into
    # the plan.  Sign bits are bounded by the signature width by design
    # (64 planes = an 8x8 default); the guard keeps a future widening
    # from silently crossing into plan-explosion territory (VERDICT r11
    # item 4) -- past it, ship the plane matrix as data like
    # _centroids_relation.
    if tables * planes_per_table * dim > 64 * LITERAL_CENTROID_MAX:
        raise ValueError(
            f"SRP-LSH would fold {tables}x{planes_per_table}x{dim} plane"
            " coefficients into the plan; ship the plane matrix as a"
            " broadcast relation (see _centroids_relation) instead."
        )
    rows = []
    for t in range(tables):
        sig = None
        for p in range(planes_per_table):
            bit = _hyperplane_sign(vec_col, t * planes_per_table + p, dim) * (2**p)
            sig = bit if sig is None else sig + bit
        rows.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return df.withColumn("tb", F.explode(F.array(*rows))).select(
        *df.columns, F.col("tb.table").alias("lsh_table"), F.col("tb.bucket").alias("lsh_bucket")
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only among candidates colliding
    with the query in at least one LSH table (equi-join on (table, bucket)
    replaces the cross join)."""
    cand = lsh_buckets(
        quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col),
        "qvec", tables=tables, planes_per_table=planes_per_table, dim=dim,
    )
    qry = lsh_buckets(
        quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col),
        "qvec", tables=tables, planes_per_table=planes_per_table, dim=dim,
    ).select(
        "qid", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm"),
        "lsh_table", "lsh_bucket",
    )
    pairs = (
        cand.join(F.broadcast(qry), ["lsh_table", "lsh_bucket"])
        .where(F.col("cand_id") != F.col("qid"))
        .dropDuplicates(["qid", "cand_id"])
    )
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    scored = pairs.select("qid", "cand_id", cosine.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "rank", "cosine")
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding", *, codes_col: str = "codes", scale_col: str = "scale") -> DataFrame:
    """Symmetric int8 quantization of a float embedding column: per-vector
    scale = max|x|, code_i = round(x_i * 127 / scale) in [-127, 127].
    4x memory/bandwidth reduction -- the standard compression for ANN
    candidate storage (re-rank survivors against the float vectors).

    All arithmetic in IEEE double with an explicit floor(x + 0.5) rounding
    so the codes are bit-identical on any engine (round() tie behavior is
    engine-defined; floor is not).  Zero vectors quantize to all-zero codes
    with scale 0."""
    df = ensure_min_parallelism(df)
    scale = F.expr(f"array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))")
    df = df.withColumn(scale_col, scale)
    codes = F.expr(
        f"CASE WHEN {scale_col} = 0.0 THEN transform({vec_col}, x -> 0)"
        f" ELSE transform({vec_col},"
        f" x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / {scale_col} + 0.5) AS INT)) END"
    )
    return df.withColumn(codes_col, codes)


# ---------------------------------------------------------------------------
# Product quantization (PQ): Jegou/Douze/Schmid, TPAMI 2011.  The vector is
# split into m subspaces; each subspace is vector-quantized against its own
# k-entry codebook, so a d-dim float vector compresses to m small codes and
# approximate distances come from per-subspace lookup TABLES (ADC) -- O(m)
# table lookups per candidate pair instead of O(d) multiplies.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 5,
) -> list[list[list[int]]]:
    """Train PQ codebooks: ``m`` subspaces x ``k`` centroids each, by Lloyd
    k-means on a DETERMINISTIC bounded sample (md5 hash-order, first
    ``sample`` vectors) -- training on a sample is standard ANN practice
    (codebooks need representativeness, not the full corpus), and it keeps
    training to ONE Spark job + driver numpy on a few thousand rows.
    Returns codebooks[s][j] = centroid j of subspace s (ints, micro-units).
    """
    import numpy as np

    q = quantized(df.select(F.col(id_col).alias("__id"), vec_col), vec_col)
    rows = (
        q.select("__id", "qvec")
        .orderBy(F.md5(F.col("__id").cast("string")), "__id")
        .limit(sample)
        .collect()
    )
    X = np.array([r["qvec"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[int]]] = []
    for s in range(m):
        S = X[:, s * dsub : (s + 1) * dsub]
        cents = S[:k].copy()  # deterministic seed: first k sample slices
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cents[j] = np.floor(S[mask].mean(axis=0))
        books.append([[int(x) for x in c] for c in cents])
    return books


def pq_md5_codebooks(
    *, m: int = 8, k: int = 16, dsub: int = 8, scale: int = 1_000_000
) -> list[list[list[int]]]:
    """Deterministic, engine-portable PQ codebooks: coordinate (s, j, d) is
    an md5-derived integer in [-scale, scale] (micro-units, the same range
    as quantized embeddings).  Used where an external oracle must replay the
    ADC pipeline value-for-value: the codebooks are pure literals derivable
    by any engine, so encode -> ADC tables -> shortlist -> re-rank all sit
    behind the oracle gate.  Codebook TRAINING is oracle-proven separately
    (kmeans_ivf_lists replays Lloyd in SQL); pq_train remains the
    data-adaptive path."""
    import hashlib

    def coord(s: int, j: int, d: int) -> int:
        h = hashlib.md5(f"pq|{s}|{j}|{d}".encode()).hexdigest()
        return int(h[:15], 16) % (2 * scale + 1) - scale

    return [
        [[coord(s, j, d) for d in range(dsub)] for j in range(k)] for s in range(m)
    ]


def _book_literal(book: list[list[int]]) -> str:
    """SQL literal array<array<bigint>> for a subspace codebook."""
    return "array(" + ", ".join(
        "array(" + ",".join(str(int(x)) for x in c) + ")" for c in book
    ) + ")"


def _subspace_d2(vec_col: str, book: list[list[int]], s: int, dsub: int) -> str:
    """SQL expr: array of squared distances from vec's subspace ``s`` slice
    to every centroid of ``book`` -- ONE transform lambda over a literal
    centroid array.  An unrolled per-centroid expression list compiles
    k copies of the same aggregate into whole-stage codegen (~1 MiB task
    binaries, multi-second JIT); the lambda form compiles once."""
    lo = s * dsub + 1  # slice() is 1-based
    return (
        f"transform({_book_literal(book)},"
        f" c -> aggregate(zip_with(slice({vec_col}, {lo}, {dsub}), c,"
        f" (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, x) -> acc + x))"
    )


def _argmin_expr(arr_col: str) -> F.Column:
    """0-based index of the minimum element; ties break to the lowest index
    (array_position returns the first match) -- the same tie rule as the
    sorted-struct formulation it replaces."""
    return F.expr(f"CAST(array_position({arr_col}, array_min({arr_col})) - 1 AS INT)")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    *,
    vec_col: str = "qvec",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach ``out_col`` = array<int> of length m (one codebook id per
    subspace).  Pure map: at 100 TB this runs in the scan stage and the
    stored codes are m bytes per vector instead of 4*dim."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # materialize each subspace's distance array once, argmin it, drop it:
    # the d2 lambda is evaluated once per row per subspace instead of twice
    # (array_position + array_min) over an inline expression
    for s in range(m):
        df = df.withColumn(f"__d2_{s}", F.expr(_subspace_d2(vec_col, codebooks[s], s, dsub)))
    codes = F.array(*[_argmin_expr(f"__d2_{s}") for s in range(m)])
    return df.withColumn(out_col, codes).drop(*[f"__d2_{s}" for s in range(m)])


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    kcent: int = 16,
    shortlist: int = 64,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-ranking.

    Stage 1 (map): encode candidates to m codes each.
    Stage 2 (map): per query, build the ADC distance TABLE -- dt[s][j] =
    ||q_s - c_{s,j}||^2, an m x kcent bigint grid folded into array columns.
    Stage 3 (broadcast join): approx_d2(candidate) = sum_s dt[s][codes[s]]
    -- m element_at lookups per pair, no vector math.  Keep ``shortlist``
    per query by approx distance, then exact-score only the shortlist.

    The shortlist ranking shuffles ONLY (qid, cand_id, approx_d2): at N
    candidates x Q queries the pair stream exists, but each shuffled row is
    ~20 bytes, not the ~2x256-byte full vectors.  The survivors (at most
    shortlist x Q rows) are then joined back to the candidate and query
    vector tables for exact re-ranking -- two small joins instead of a
    vector-payload shuffle of the whole cross product.

    Everything is exact integer arithmetic until the final cosine; the
    recall/compute trade dials are (m, kcent, shortlist)."""
    books = codebooks or pq_train(
        candidates, id_col=id_col, vec_col=vec_col, m=m, k=kcent
    )
    m = len(books)
    dsub = len(books[0][0])
    cand = pq_encode(
        quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col),
        books,
    )
    # per-query ADC tables: dt_s = array(d2(q_s, c_s0), ..., d2(q_s, c_s{k-1}))
    qry = quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col)
    for s in range(m):
        qry = qry.withColumn(f"__dt_{s}", F.expr(_subspace_d2("qvec", books[s], s, dsub)))
    qry_tables = qry.select("qid", *[f"__dt_{s}" for s in range(m)])
    qry_vecs = qry.select(
        "qid", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm")
    )
    # slim pair stream: codes only -- the full vectors stay OUT of the
    # per-pair plan until after the shortlist cut.  The codes are
    # materialized ONCE (lazy localCheckpoint): the cutoff pass and the
    # filter pass below both read the stored m-byte codes instead of
    # re-running the encode expressions -- the operator-level analogue of
    # "PQ codes are the stored representation" (and it halves the plan's
    # codebook-literal footprint, which is what dominates small-scale
    # latency).
    cand_codes = cand.select("cand_id", "pq_codes").localCheckpoint(eager=False)
    pairs = (
        cand_codes
        .crossJoin(F.broadcast(qry_tables))
        .where(F.col("cand_id") != F.col("qid"))
    )
    approx = None
    for s in range(m):
        term = F.element_at(F.col(f"__dt_{s}"), F.col("pq_codes")[s] + 1)
        approx = term if approx is None else approx + term
    slim = pairs.select("qid", "cand_id", approx.alias("approx_d2"))
    # Partial top-k BEFORE the global per-qid window, via a bucket-minima
    # cutoff: hash candidates into B = margin*shortlist buckets and take
    # min(approx_d2) per (qid, bucket) -- a scalar-buffer aggregate that
    # partial-combines map-side, so the shuffle carries B x Q scalars
    # instead of the N x Q pair stream.  The `shortlist`-th smallest bucket
    # minimum is a PROVABLY valid cutoff: each of the shortlist smallest
    # bucket minima witnesses a distinct pair <= it, so the value at true
    # rank `shortlist` is <= that minimum, and the <=-filter (ties kept)
    # passes a superset of the exact shortlist -- the window then produces
    # the identical result, ranking ~1.2x shortlist survivors per query
    # (64th order statistic of bucket minima, B = 4x shortlist) instead of
    # every candidate.  A qid with fewer than `shortlist` non-empty buckets
    # gets no cutoff row (NULL after the left join) and keeps everything.
    # The ADC lookup runs twice (cutoff pass + filter pass); deployed, the
    # codes are the STORED m-byte representation, so both passes scan
    # codes, not vectors -- two scans of the 100x-smaller table beat one
    # N x Q shuffle.
    B = 4 * shortlist
    bmin = slim.groupBy(
        "qid", F.pmod(F.xxhash64("cand_id"), F.lit(B)).alias("__bkt")
    ).agg(F.min("approx_d2").alias("__bmin"))
    cutoffs = (
        bmin.withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("qid").orderBy("__bmin")),
        )
        .where(F.col("__rk") == shortlist)
        .select("qid", F.col("__bmin").alias("__cut"))
    )
    slim = slim.join(F.broadcast(cutoffs), "qid", "left").where(
        F.col("__cut").isNull() | (F.col("approx_d2") <= F.col("__cut"))
    )
    shortlisted = (
        slim.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("approx_d2", "cand_id")
            ),
        )
        .where(F.col("__rk") <= shortlist)
        .select("qid", "cand_id")
    )
    # exact re-rank on the survivors only: join the vectors back in.  The
    # shortlist side is at most shortlist x Q rows, so AQE broadcasts it
    # against the candidate table; the query vectors broadcast outright.
    rerank = shortlisted.join(
        cand.select("cand_id", "qvec", "qnorm"), "cand_id"
    ).join(F.broadcast(qry_vecs), "qid")
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        rerank.select("qid", "cand_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "rank", "cosine")
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "proj",
    *,
    out_dim: int = 16,
    scale: int = 10000,
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a deterministic
    Rademacher (+1/-1) matrix: proj[j] = sum_i q[i] * sign(i, j), where q
    quantizes the float vector to integers (floor(x*scale + 0.5)) and
    sign(i, j) is the parity of the first md5 nibble of "i_j".

    Achlioptas (2001) shows +-1 entries give the JL guarantee, so pairwise
    distances survive 64 -> out_dim within ~1/sqrt(out_dim).  Everything is
    integer arithmetic on md5 parities, so any engine reproduces the exact
    projection -- no stored projection matrix to ship.  Map-only: the whole
    operator is one nested higher-order expression per row, NO shuffle, NO
    Python, NO driver state; at 100 TB it runs at scan speed and cuts every
    downstream ANN/cluster shuffle by dim/out_dim.

    When ``in_dim`` is given, the out_dim x in_dim sign matrix is evaluated
    ONCE at plan-build time (Python hashlib.md5 == Spark md5 bit-for-bit)
    and folded in as a bounded literal, so each row does in_dim*out_dim
    integer mult-adds instead of ALSO re-hashing the matrix: the per-row
    md5(concat(i,'_',j)) of the portable path costs in_dim*out_dim string
    hashes PER ROW (~1024/row at 64->16), which dominated the operator by
    >10x and would be the whole scan cost at 100 TB.  A runtime
    ``assert_true`` guards the in_dim contract (zip_with would otherwise
    null-pad a mismatched vector silently).  ``in_dim=None`` keeps the
    dimension-agnostic per-row derivation for unknown-width inputs.

    Parity of the reference's feature-engineering surface
    (src/data_processor.py transform stage) extended to embedding columns."""
    q = (
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))"
    )
    if in_dim is not None:
        import hashlib

        signs = "array(" + ",".join(
            "array(" + ",".join(
                str(
                    2
                    * (int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0], 16) % 2)
                    - 1
                )
                for i in range(in_dim)
            ) + ")"
            for j in range(out_dim)
        ) + ")"
        proj = (
            f"IF(assert_true(size(__q) = {in_dim}) IS NULL, "
            f"transform({signs}, row -> "
            f"aggregate(zip_with(__q, row, (x, s) -> x * s), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)), NULL)"
        )
    else:
        proj = (
            f"transform(sequence(0, {out_dim - 1}), j -> "
            f"aggregate(zip_with(__q, sequence(0, size(__q) - 1), "
            f"(x, i) -> x * (2 * (CAST(conv(substr(md5(concat(i, '_', j)), 1, 1), 16, 10)"
            f" AS BIGINT) % 2) - 1)), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x))"
        )
    return (
        df.withColumn("__q", F.expr(q))
        .withColumn(out_col, F.expr(proj))
        .drop("__q")
    )


def centroid_assign_exact(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "qvec",
    topic_col: str = "topic",
    dist_col: str = "d2",
) -> DataFrame:
    """Assign each quantized vector to the nearest of ``centroids`` by
    exact integer squared L2, keeping the distance; ties break to the
    lowest centroid index.  The centroids are driver-collected constants
    (k x dim ints) folded into one JVM expression -- assignment is a pure
    map inside whole-stage codegen, NO join, NO shuffle: the pattern that
    lets a 100 TB topical-filter pass run at scan speed.  Past
    LITERAL_CENTROID_AUTO the same math runs over a broadcast centroid
    relation instead (see ivf_assign) so the plan stays O(1)."""
    if len(centroids) > LITERAL_CENTROID_AUTO:
        joined = df.crossJoin(
            F.broadcast(_centroids_relation(df.sparkSession, centroids))
        )
        best = _ranked_over_cents(vec_col, metric="l2")[0]
        return (
            joined.withColumn(topic_col, best["j"])
            .withColumn(dist_col, best["d"])
            .drop("__cents")
        )
    entries = []
    for j, c in enumerate(centroids):
        arr = "array(" + ",".join(f"CAST({int(x)} AS BIGINT)" for x in c) + ")"
        d2 = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        entries.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
    best = F.array_sort(F.array(*entries))[0]
    return df.withColumn(topic_col, best["j"]).withColumn(dist_col, best["d"])


def assign_two_level(
    df: DataFrame,
    centroids: list[list[int]],
    *,
    vec_col: str = "qvec",
    topic_col: str = "topic",
    dist_col: str = "d2",
) -> DataFrame:
    """Two-level centroid assignment -- the compute-scaling complement of
    the broadcast data path: where the data path fixes PLAN size at
    k ~ sqrt(N), this fixes assignment COMPUTE, from O(k) distances per
    point to O(2*sqrt(k)) (g = ceil(sqrt(k)) super-centroids, then exact
    argmin within the winning super's member group) -- ~70x fewer
    distance evaluations at k = 31623.  The standard coarse-quantizer
    trick (FAISS IVF-on-IVF / two-level k-means a la Jegou et al.); the
    assignment is APPROXIMATE vs the global argmin (the winning super's
    group may not hold it) but fully DETERMINISTIC, so an external
    engine replays it value-for-value:

    * supers = the first g centroids BY INDEX (the seed idiom ivf_topk
      and ivfpq_topk already use);
    * every centroid joins the group of its nearest super (exact integer
      d2, ties to the lowest super index) -- k x g integer work, done
      driver-side here (bounded: k*g*dim ~ 3.6e8 int ops at k=31623 is a
      one-off; at larger k run this grouping itself as a Spark job);
    * per point: nearest super among g (stage A), then exact argmin over
      that group's members (stage B), ties to the lowest index at both
      stages.

    Stage A folds g <= ~256 literals (or takes the data path past the
    threshold); stage B is a broadcast equi-JOIN on the super id against
    a g-row relation of member arrays -- one BroadcastHashJoin, no
    shuffle of the vector table, argmin as a higher-order transform.

    From k >= TWO_LEVEL_ARROW_MIN both per-point stages instead run as
    exact int64 numpy matmuls inside one mapInArrow
    (_assign_two_level_arrow; r14, guide §4.2) -- identical values and
    tie-breaks, no join, no shuffle, and the per-point constant drops
    from interpreted higher-order lambdas to vectorized C.  Callers
    should pass only the columns they need (mapInArrow is opaque to
    column pruning).
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    k = len(centroids)
    g = math.ceil(math.sqrt(k))
    supers = centroids[:g]
    dim = len(centroids[0]) if centroids else 0

    def d2_py(a, b) -> int:
        return sum((int(x) - int(y)) * (int(x) - int(y)) for x, y in zip(a, b))

    # group each centroid under its nearest super (tie -> lowest s).
    # Driver-side Python is fine while k*g*dim stays small, but it is
    # O(k^1.5 * dim) and the r13 100x rehearsal measured it DOMINATING the
    # whole query at k=8000 (46M interpreted int ops) -- past the budget
    # the same exact argmin runs as one bounded Spark job
    # (centroid_assign_exact: identical integer L2, identical lowest-index
    # tie-break) and only the k (j -> super) ints come back to the driver.
    groups: dict[int, list] = {s: [] for s in range(g)}
    if k * g * dim > TWO_LEVEL_DRIVER_BUDGET:
        from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

        cent_rows = [(j, [int(x) for x in c]) for j, c in enumerate(centroids)]
        cent_df = local_relation(
            df.sparkSession, cent_rows, "j int, qvec array<bigint>"
        )
        assigned_sup = centroid_assign_exact(
            cent_df, supers, vec_col="qvec", topic_col="__s"
        )
        # bounded collect license: k (j, super) int pairs
        j_to_s = {r["j"]: r["__s"] for r in assigned_sup.select("j", "__s").collect()}
        for j, c in enumerate(centroids):
            groups[j_to_s[j]].append(
                (j, [int(x) for x in c], sum(int(x) * int(x) for x in c))
            )
    else:
        for j, c in enumerate(centroids):
            best_s = min(range(g), key=lambda s: (d2_py(c, supers[s]), s))
            groups[best_s].append(
                (j, [int(x) for x in c], sum(int(x) * int(x) for x in c))
            )

    if k >= TWO_LEVEL_ARROW_MIN:
        return _assign_two_level_arrow(
            df, supers, groups,
            vec_col=vec_col, topic_col=topic_col, dist_col=dist_col,
        )
    member_struct = StructType(
        [
            StructField("j", IntegerType(), False),
            StructField("cvec", ArrayType(LongType(), False), False),
            StructField("cnorm", LongType(), False),
        ]
    )
    rel_schema = StructType(
        [
            StructField("__sup", IntegerType(), False),
            StructField("__members", ArrayType(member_struct, False), False),
        ]
    )
    spark = df.sparkSession
    member_rows = [(s, groups[s]) for s in range(g) if groups[s]]
    # pandas/Arrow for the same reason as _centroids_relation: a plain
    # local-list relation executes as a pickled Python RDD and costs a
    # multi-second Python-worker round trip per job that scans it
    try:
        import pandas as pd

        members_rel = spark.createDataFrame(
            pd.DataFrame(
                {"__sup": [r[0] for r in member_rows],
                 "__members": [r[1] for r in member_rows]}
            ),
            rel_schema,
        )
    except Exception:
        members_rel = spark.createDataFrame(member_rows, rel_schema)

    staged = ivf_assign(df, supers, vec_col=vec_col, out_col="__sup", nprobe=1)
    joined = staged.join(F.broadcast(members_rel), "__sup")
    best = F.expr(
        f"array_sort(transform(__members, c -> named_struct("
        f"'d', aggregate(zip_with({vec_col}, c.cvec, (x, y) -> (x - y) * (x - y)),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x),"
        f" 'j', c.j)))[0]"
    )
    return (
        joined.withColumn(topic_col, best["j"])
        .withColumn(dist_col, best["d"])
        .drop("__sup", "__members")
    )


def _assign_two_level_arrow(
    df: DataFrame,
    supers: list[list[int]],
    groups: dict[int, list],
    *,
    vec_col: str,
    topic_col: str,
    dist_col: str,
) -> DataFrame:
    """Arrow/numpy twin of assign_two_level's per-point stages (r14,
    guide §4.2): one mapInArrow whose batches run stage A (nearest super)
    and stage B (exact argmin within the winning super's member group) as
    int64 matrix products -- value-identical to the SQL expression path:

    * exact integer squared L2 throughout (numpy int64 matmul is exact;
      products stay far inside int64 for quantized vectors);
    * stage A drops the row-constant ||v||^2 term, which cannot change
      the argmin or its ties; np.argmin returns the FIRST minimum =
      lowest super index, the SQL path's tie-break;
    * member matrices are ordered by centroid index j ascending (the
      groups lists are built in enumerate order), so stage B's first
      minimum is the lowest j, again matching array_sort((d, j)).

    The member matrices travel inside the serialized function (Spark
    broadcasts large Python commands automatically); k*dim int64 at the
    k ~ sqrt(N)/(N/c) design points is MBs, not GBs.  Input vectors must
    be non-null, fixed-dim (the quantized() contract for non-null
    embeddings); a null/ragged batch fails loudly in the reshape rather
    than silently mis-assigning."""
    import numpy as np
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    S = np.asarray(supers, dtype=np.int64)
    Sn = (S * S).sum(axis=1)
    dim = S.shape[1]
    members: dict[int, tuple] = {}
    for s, mem in groups.items():
        if mem:
            members[int(s)] = (
                np.asarray([m[1] for m in mem], dtype=np.int64),
                np.asarray([m[2] for m in mem], dtype=np.int64),
                np.asarray([m[0] for m in mem], dtype=np.int32),
            )
    vec_idx = df.columns.index(vec_col)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(topic_col, IntegerType(), True),
            StructField(dist_col, LongType(), True),
        ]
    )

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            col = batch.column(vec_idx)
            if col.null_count:
                raise ValueError(
                    "assign_two_level: null vectors are not assignable"
                    f" ({col.null_count} null {vec_idx}-col rows in batch)"
                )
            V = np.asarray(col.flatten(), dtype=np.int64).reshape(n, dim)
            Vn = (V * V).sum(axis=1)
            sup = np.argmin(V @ (S.T * -2) + Sn[None, :], axis=1)
            topic = np.empty(n, dtype=np.int32)
            d2 = np.empty(n, dtype=np.int64)
            for s in np.unique(sup):
                rows = np.flatnonzero(sup == s)
                if int(s) not in members:
                    # unreachable: an empty super implies an identical
                    # lower-index super that wins every tie
                    raise RuntimeError(f"empty super group {int(s)} selected")
                M, Mn, J = members[int(s)]
                dists = Vn[rows, None] + (V[rows] @ (M.T * -2) + Mn[None, :])
                am = np.argmin(dists, axis=1)
                topic[rows] = J[am]
                d2[rows] = dists[np.arange(len(rows)), am]
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(topic), pa.array(d2)],
                names=list(batch.schema.names) + [topic_col, dist_col],
            )

    return df.mapInArrow(assign, out_schema)


def ivfpq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    kcent: int = 16,
    dsub: int = 8,
    shortlist: int = 64,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """IVF-PQ composed ANN (the FAISS IndexIVFPQ architecture): coarse
    quantizer prunes the candidate stream to ``nprobe``/``nlist`` of the
    corpus via an equi-join on list id, and PQ-ADC scores RESIDUALS
    (vector minus its list centroid) inside the probed lists only, before
    an exact cosine re-rank of the per-query shortlist.

    This is the billion-scale shape: unlike :func:`pq_topk` (whose ADC pair
    stream is all N x Q code rows), the pair stream here is
    ~(nprobe/nlist) x N x Q and every stage before the final re-rank is a
    map or an equi-join -- no cross join anywhere.  Residual encoding keeps
    PQ's quantization error centered per list (the reason IVFPQ beats
    IVF+flat-PQ at equal code budget).

    Everything is exact integer arithmetic until the final cosine: coarse
    centroids are the first ``nlist`` candidates by id (driver constants,
    swap in kmeans_quantizer output at will), codebooks default to the
    md5-derived engine-portable literals, assignment/argmin ties break to
    the lowest index -- so an external engine can replay the entire
    pipeline value-for-value."""
    # PQ codebooks are bytes-per-subspace by definition (kcent <= 256) and
    # stay plan-folded; the guard keeps a future "bigger codebooks" edit
    # from silently reintroducing the plan-literal explosion that the
    # centroid path below now avoids (VERDICT r11 item 4).  Checked
    # BEFORE generating default codebooks -- the md5 derivation itself is
    # m*k*dsub driver work.
    n_book_k = len(codebooks[0]) if codebooks else kcent
    n_book_d = len(codebooks[0][0]) if codebooks else dsub
    if m * n_book_k * n_book_d > 64 * LITERAL_CENTROID_MAX:
        raise ValueError(
            f"PQ codebooks fold {m}x{n_book_k}x{n_book_d} ints into the plan;"
            " past ~16k values, ship them as data (see _centroids_relation)"
            " instead of growing the fold."
        )
    books = codebooks or pq_md5_codebooks(m=m, k=kcent, dsub=dsub)
    dsub = len(books[0][0])
    cand = quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col)
    qry = quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col)

    cents = [
        row["qvec"] for row in cand.orderBy("cand_id").limit(nlist).select("qvec").collect()
    ]

    def residual(df: DataFrame) -> DataFrame:
        """vector minus its owning list's centroid, as ``__res``.  Folded
        centroid literal up to LITERAL_CENTROID_AUTO lists; broadcast
        centroid relation past it (same data-path switch as ivf_assign:
        at nlist ~ sqrt(N) the literal would not survive analysis)."""
        if nlist > LITERAL_CENTROID_AUTO:
            return (
                df.crossJoin(F.broadcast(_centroids_relation(df.sparkSession, cents)))
                .withColumn(
                    "__res",
                    F.expr(
                        "zip_with(qvec, element_at(__cents, ivf_list + 1).cvec,"
                        " (x, y) -> x - y)"
                    ),
                )
                .drop("__cents")
            )
        cent_lit = _book_literal(cents)
        return df.withColumn(
            "__res",
            F.expr(f"zip_with(qvec, element_at({cent_lit}, ivf_list + 1), (x, y) -> x - y)"),
        )

    # candidates: one list each; residual vs the owning centroid; PQ codes
    # on the residual.  All JVM maps -- at scale this runs in the scan
    # stage and stores (list_id, m bytes) per vector.
    cand_l = residual(ivf_assign(cand, cents, nprobe=1))
    cand_codes = pq_encode(cand_l, books, vec_col="__res").select(
        "cand_id", "ivf_list", "pq_codes"
    )

    # queries: nprobe lists each; one ADC table PER (query, probed list),
    # built from the residual against THAT list's centroid
    qry_l = residual(
        ivf_assign(qry, cents, nprobe=nprobe).select(
            "qid", "qvec", F.explode("ivf_list").alias("ivf_list")
        )
    )
    for s in range(m):
        qry_l = qry_l.withColumn(f"__dt_{s}", F.expr(_subspace_d2("__res", books[s], s, dsub)))
    qry_tables = qry_l.select("qid", "ivf_list", *[f"__dt_{s}" for s in range(m)])

    # probed-list pair stream: equi-join on list id (THE pruning step)
    pairs = cand_codes.join(F.broadcast(qry_tables), "ivf_list").where(
        F.col("cand_id") != F.col("qid")
    )
    approx = None
    for s in range(m):
        term = F.element_at(F.col(f"__dt_{s}"), F.col("pq_codes")[s] + 1)
        approx = term if approx is None else approx + term
    slim = pairs.select("qid", "cand_id", approx.alias("approx_d2"))
    shortlisted = (
        slim.withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("qid").orderBy("approx_d2", "cand_id")),
        )
        .where(F.col("__rk") <= shortlist)
        .select("qid", "cand_id")
    )

    # exact re-rank on raw vectors, shortlist-sized joins only
    rerank = shortlisted.join(cand.select("cand_id", "qvec", "qnorm"), "cand_id").join(
        F.broadcast(qry.select("qid", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm"))),
        "qid",
    )
    dot = F.expr(DOT.format(a="q_qvec", b="qvec"))
    cosine = dot.cast("double") / F.sqrt(
        F.col("q_qnorm").cast("double") * F.col("qnorm").cast("double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        rerank.select("qid", "cand_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cand_id", "rank", "cosine")
    )


def _d2_const(vec_col: str, ints) -> F.Column:
    """Exact squared L2 distance between a quantized vector column and a
    constant quantized vector, folded JVM-side as BIGINT."""
    arr = ",".join(str(int(x)) for x in ints)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({arr}), (x, y) -> (x - y) * (x - y)),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def kcenter_coreset(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal, 2-approximation to the k-center optimum): pick the vector
    with the lowest id as the seed, then k-1 times pick the vector FARTHEST
    from everything selected so far -- the DIVERSITY-pruning primitive of a
    training-data pipeline (SemDeDup removes redundancy, DSIR reweights by
    target fit; k-center picks the maximally-covering exemplar subset, the
    standard coreset for active learning / data pruning).

    Each round is ONE distributed pass: the running min-distance column is
    updated with `least(mind2, d2-to-new-center)` where the new center is a
    folded JVM constant (the ivf_assign pattern), and the argmax row comes
    back through a TakeOrdered(1) -- k bounded single-row collects total,
    never a data-sized collect.  localCheckpoint per round truncates the
    lineage so round t does not recompute rounds 1..t-1 (and each pass
    scans the shrinking remainder once).  All arithmetic is exact BIGINT
    over e6-quantized coordinates (64 dims x (0.76e6)^2 ~ 3.7e13, far
    inside int64), ties broken by lowest id -- fully deterministic, so the
    DuckDB oracle replays the trace value-for-value.

    Returns the selection TRACE: (sel_order int, id_col, d2 bigint) with
    d2 = exact squared quantized distance from the pick to the previously
    selected set (0 for the seed) -- d2 of pick t is the coverage radius
    of the first t-1 centers, so the trace doubles as the elbow curve for
    choosing k.  If the table has fewer than k rows the trace is the full
    farthest-point ordering of the table.

    Contract: O(k) blocking driver rounds -- sized for elbow-curve k
    (<= ~100).  A coreset caller wanting k in the thousands should use
    :func:`kcenter_coreset_batched` (~k/batch rounds, radius
    property-tested within 2x of this exact greedy)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the algorithm is id-type-agnostic (the id only seeds, tiebreaks and
    # labels) -- carry the caller's id DataType through to the result
    # instead of assuming bigint
    out_schema = T.StructType(
        [
            T.StructField("sel_order", T.IntegerType(), False),
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("d2", T.LongType(), True),
        ]
    )
    cand = quantized(df.select(F.col(id_col).alias("__id"), vec_col), vec_col).persist()
    # unpersist even when a job fails -- a crashed query must not leak the
    # quantized cache into the shared session
    try:
        seed_rows = cand.orderBy("__id").limit(1).select("__id", "qvec").collect()
        if not seed_rows:
            return df.sparkSession.createDataFrame([], out_schema)
        seed = seed_rows[0]
        state = (
            cand.select("__id", "qvec")
            .where(F.col("__id") != seed["__id"])
            .withColumn("mind2", _d2_const("qvec", seed["qvec"]))
            .localCheckpoint(eager=True)
        )
    finally:
        cand.unpersist()
    chosen: list[tuple] = [(1, seed["__id"], 0)]
    for t in range(2, k + 1):
        rows = state.orderBy(F.col("mind2").desc(), F.col("__id")).limit(1).collect()
        if not rows:
            break
        pick = rows[0]
        chosen.append((t, pick["__id"], pick["mind2"]))
        if t == k:
            break
        state = (
            state.where(F.col("__id") != pick["__id"])
            .withColumn("mind2", F.least(F.col("mind2"), _d2_const("qvec", pick["qvec"])))
            .localCheckpoint(eager=True)
        )
    from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

    return local_relation(df.sparkSession, chosen, out_schema)


def _pyd2(a: list[int], b: list[int]) -> int:
    """Exact squared L2 between two quantized vectors, driver-side Python
    ints (arbitrary precision -- matches the JVM BIGINT arithmetic of
    :func:`_d2_const` exactly inside int64 range)."""
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def kcenter_coreset_batched(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    batch: int = 8,
) -> DataFrame:
    """Greedy k-center for LARGE k: over-sampled farthest-point selection
    (the k-means|| idea applied to Gonzalez traversal -- Bahmani et al.,
    VLDB 2012 motivates batching the sequential picks).  The plain
    :func:`kcenter_coreset` is O(k) blocking driver rounds by design --
    right for elbow-curve k (<= ~100), wrong for a coreset caller wanting
    k ~ 10^4 centers.  This variant does ceil-ish k/batch distributed
    rounds: each round ONE distributed pass collects the ``batch`` farthest
    candidates (a batch-bounded collect, never data-sized), then a
    driver-side EXACT greedy over those candidates accepts a prefix of
    them under a half-threshold rule before ONE distributed min-distance
    update folds all accepted centers back in.

    Acceptance rule (what keeps quality near sequential greedy): within a
    round, candidates are re-picked locally by exact updated distance
    (min of the distributed mind2 and the distances to batch-mates already
    accepted -- both exact, so every emitted d2 is the TRUE distance to
    the previously selected set at selection time), and a candidate is
    accepted only while its updated d2 >= tau = (round's top d2) / 2.
    Every accepted center is therefore >= tau from ALL earlier centers, so
    a round never wastes picks on one dense clump; rejected candidates are
    simply re-found by a later round's distributed pass.  With batch=1 the
    algorithm IS kcenter_coreset (tested).  The coverage radius stays
    within a small constant of sequential greedy's (property-tested at <=
    2x across random instances; sequential greedy itself is a
    2-approximation of the k-center optimum, Gonzalez 1985).

    Scale shape: driver blocking rounds drop from k to ~k/batch; each
    round is one TakeOrdered(batch) + one least()-fold of <= batch JVM
    constants; collects are batch-bounded.  For k=10^4, batch=64 => ~160
    rounds instead of 10^4.

    Returns the same trace shape as kcenter_coreset: (sel_order int,
    id_col, d2 bigint), d2 exact at selection time; ties broken by lowest
    id -- fully deterministic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    out_schema = T.StructType(
        [
            T.StructField("sel_order", T.IntegerType(), False),
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("d2", T.LongType(), True),
        ]
    )
    cand = quantized(df.select(F.col(id_col).alias("__id"), vec_col), vec_col).persist()
    try:
        seed_rows = cand.orderBy("__id").limit(1).select("__id", "qvec").collect()
        if not seed_rows:
            return df.sparkSession.createDataFrame([], out_schema)
        seed = seed_rows[0]
        state = (
            cand.select("__id", "qvec")
            .where(F.col("__id") != seed["__id"])
            .withColumn("mind2", _d2_const("qvec", seed["qvec"]))
            .localCheckpoint(eager=True)
        )
    finally:
        cand.unpersist()
    chosen: list[tuple] = [(1, seed["__id"], 0)]
    while len(chosen) < k:
        want = min(batch, k - len(chosen))
        rows = state.orderBy(F.col("mind2").desc(), F.col("__id")).limit(want).collect()
        if not rows:
            break
        # driver-side exact greedy over the candidate batch: updated[i] is
        # the TRUE d2 of candidate i vs (all previous centers + the
        # batch-mates accepted so far) -- the distributed mind2 already
        # covers previous centers, batch-mates are folded in exactly here
        updated = {r["__id"]: (r["mind2"], list(r["qvec"])) for r in rows}
        tau2 = rows[0]["mind2"]  # accept while 2 * d2 >= tau2 (= top/2, exact)
        accepted: list[tuple] = []  # (id, d2, qvec)
        # `rows` is already capped at the remaining budget (want), so the
        # loop is bounded by it
        while updated:
            pick_id = None
            best = -1
            for i, (m, _) in updated.items():
                if m > best or (m == best and (pick_id is None or i < pick_id)):
                    pick_id, best = i, m
            d2, qv = updated.pop(pick_id)
            if 2 * d2 < tau2:
                break
            accepted.append((pick_id, d2, qv))
            for i, (m, q) in updated.items():
                updated[i] = (min(m, _pyd2(q, qv)), q)
        for pick_id, d2, _ in accepted:
            chosen.append((len(chosen) + 1, pick_id, d2))
        upd = F.col("mind2")
        for _, _, qv in accepted:
            upd = F.least(upd, _d2_const("qvec", qv))
        state = (
            state.where(~F.col("__id").isin([a[0] for a in accepted]))
            .withColumn("mind2", upd)
            .localCheckpoint(eager=True)
        )
    from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

    return local_relation(df.sparkSession, chosen, out_schema)
