"""Text analysis operators for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, fingerprinting.

All JVM-side built-ins (regexp/hash functions) -- no Python in the hot path,
so these run at full whole-stage-codegen speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\S+"

# tiny deterministic stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
    "de": ["der", "und", "die", "das", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # romanized placeholders
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.expr(f"regexp_extract_all({c._jc.toString() if hasattr(c, '_jc') else col}, '{TOKEN_PATTERN}', 0)")


def with_tokens(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_PATTERN}', 0)"))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens / n_unique_tokens / sum_token_len columns."""
    df = with_tokens(df, text_col)
    return (
        df.withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_unique_tokens", F.size(F.array_distinct("tokens")))
        .withColumn(
            "sum_token_len",
            F.expr("aggregate(transform(tokens, t -> length(t)), CAST(0 AS BIGINT), (a, x) -> a + x)"),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features (integer-exact where aggregated):
    char/token counts, unique ratio, stopword count.  A 100 TB curation pass
    filters on these before any expensive model-based scoring."""
    df = token_stats(df, text_col)
    stop = LANG_PROFILES["en"]
    stop_arr = "array(" + ",".join(f"'{s}'" for s in stop) + ")"
    return df.withColumn(
        "n_stopwords",
        F.expr(f"size(filter(tokens, t -> array_contains({stop_arr}, t)))"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """n-gram/stopword-profile language ID: score = number of profile-word
    hits; argmax with a fixed tie order (profile declaration order)."""
    df = with_tokens(df, text_col)
    langs = list(LANG_PROFILES)
    for lang, words in LANG_PROFILES.items():
        arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
        df = df.withColumn(f"__score_{lang}", F.expr(f"size(filter(tokens, t -> array_contains({arr}, t)))"))
    # earliest language attaining the max score wins (fixed tie order =
    # profile declaration order); greatest() keeps the expression linear
    # instead of a nested fold (codegen size matters at 5 + languages)
    best = F.greatest(*[F.col(f"__score_{la}") for la in langs])
    pred = None
    for lang in reversed(langs):
        cond = F.col(f"__score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    # reversed fold means earlier langs override later ones on ties
    out = df.withColumn(out_col, pred)
    return out.drop(*[f"__score_{lang}" for lang in langs])


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of the normalized text (lowercase, collapsed
    whitespace).  Stable across engines and runs; the join key for exact
    dedup at scale."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Split each document into overlapping token windows (the standard
    pre-tokenization step for LLM training shards): window ``chunk_tokens``
    wide, advancing ``stride`` tokens, final partial window kept.

    One row in, ceil(max(n-W,0)/S)+1 rows out (for stride <= chunk_tokens),
    columns (id_cols..., chunk_id, chunk_text, n_chunk_tokens).  Pure array
    arithmetic (sequence + slice) -- no Python, no shuffle; at 100 TB this
    is a map-only stage.

    The sequence upper bound is ``n - W + S`` (capped at ``n``) rather than
    ``n - W + 1`` so that when ``(n - W) % S != 0`` one extra start is
    emitted and the final partial window is actually kept -- otherwise up
    to ``S - 1`` trailing tokens would be silently dropped."""
    id_cols = id_cols or ["doc_id"]
    df = with_tokens(df, text_col, "__toks")
    upper = (
        f"least(greatest(size(__toks) - {chunk_tokens} + {stride}, 1),"
        f" greatest(size(__toks), 1))"
    )
    chunks = df.select(
        *id_cols,
        F.posexplode(
            F.expr(
                f"transform(sequence(1, {upper}, {stride}),"
                f" i -> slice(__toks, i, {chunk_tokens}))"
            )
        ).alias("chunk_id", "__chunk"),
    )
    return chunks.select(
        *id_cols,
        "chunk_id",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").alias("n_chunk_tokens"),
    )


def repetition_grams(df: DataFrame, text_col: str = "text", *, n: int = 2) -> DataFrame:
    """Explode each document into its (non-distinct) word n-grams: one row
    per n-gram occurrence, columns (input cols minus text..., gram).

    Feeds repetition-quality filtering (Gopher-style, Rae et al. 2021
    "Scaling Language Models": high top-n-gram fraction marks boilerplate /
    degenerate text).  Distinctness is deliberately NOT applied -- the
    signal is exactly the repeat multiplicity."""
    from odp_dynamic_data_pipeline_spark.operators.partitioning import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    df = with_tokens(df, text_col, "__toks")
    gram = F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 0)),"
        f" i -> array_join(slice(__toks, i, {n}), ' '))"
    )
    keep = [c for c in df.columns if c not in (text_col, "__toks")]
    return df.select(*keep, F.explode(gram).alias("gram"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_16ths: dict[str, int],
    id_col: str = "doc_id",
    *,
    default_16ths: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: keep ~``rates_16ths[stratum]``/16
    of each stratum, gated on the md5 hex prefix of the stable id -- NOT
    rand(), so the same row set survives on every engine, run, and cluster
    layout.  This is corpus mixture re-weighting (upsample scarce domains,
    downsample dominant ones) as a pure map-side filter: no shuffle, no
    state, trivially correct under retries."""
    hex_digit = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    thresholds = "0123456789abcdefg"
    gate = None
    for stratum, sixteenths in rates_16ths.items():
        cond = F.col(strata_col) == stratum
        test = hex_digit < F.lit(thresholds[sixteenths])
        gate = F.when(cond, test) if gate is None else gate.when(cond, test)
    gate = gate.otherwise(hex_digit < F.lit(thresholds[default_16ths]))
    return df.where(gate)


PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?[0-9][0-9() .-]{7,}[0-9]"


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Redact email addresses and phone-number-shaped digit runs
    ([EMAIL]/[PHONE] placeholders).  JVM regexp_replace, global by default
    -- the deterministic first line of PII hygiene in a corpus pipeline
    (model-based NER passes come later, off the hot path)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]"),
        PII_PHONE,
        "[PHONE]",
    )
    return df.withColumn(out_col, scrubbed)
