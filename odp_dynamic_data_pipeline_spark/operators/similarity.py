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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = "transform({col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
NORM = "aggregate(transform({a}, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"


def quantized(df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec") -> DataFrame:
    df = df.withColumn(out_col, F.expr(QUANT.format(col=vec_col)))
    return df.withColumn("qnorm", F.expr(NORM.format(a=out_col)))


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


def _hyperplane_sign(vec_col: str, plane: int, dim: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[j] in {-1,+1} derives from
    xxhash64(plane, j) -- a deterministic random hyperplane."""
    terms = (
        f"aggregate(zip_with({vec_col}, sequence(0, {dim - 1}),"
        f" (x, j) -> CASE WHEN xxhash64({plane}, j) % 2 = 0 THEN x ELSE -x END),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    )
    return (F.expr(terms) > 0).cast("int")


def lsh_bucket(df: DataFrame, vec_col: str = "embedding", *, planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id: `planes`-bit signature."""
    sig = None
    for p in range(planes):
        bit = _hyperplane_sign(vec_col, p, dim) * (2**p)
        sig = bit if sig is None else sig + bit
    return df.withColumn("lsh_bucket", sig)


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket (equi-join on bucket id replaces the cross join)."""
    cand = lsh_bucket(quantized(candidates.select(F.col(id_col).alias("cand_id"), vec_col), vec_col), "qvec", planes=planes, dim=dim)
    qry = lsh_bucket(quantized(queries.select(F.col(id_col).alias("qid"), vec_col), vec_col), "qvec", planes=planes, dim=dim).select(
        "qid", F.col("qvec").alias("q_qvec"), F.col("qnorm").alias("q_qnorm"), "lsh_bucket"
    )
    pairs = cand.join(F.broadcast(qry), "lsh_bucket").where(F.col("cand_id") != F.col("qid"))
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
