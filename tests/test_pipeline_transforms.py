"""Declarative transforms in the YAML dialect: the curation funnel as pure
config, equal to the hand-built operator composition."""

from __future__ import annotations

import yaml

from odp_dynamic_data_pipeline_spark.operators import dedup as dd
from odp_dynamic_data_pipeline_spark.operators import text as tx
from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline
from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

SPEC = """
pipeline_name: curation_demo
stages:
  curate:
    description: quality gate -> fingerprint -> dedup -> chunk, from config
    input:
      format: parquet
      path: "{sf}/documents.parquet"
    transforms:
      - op: quality
      - op: filter
        expr: "n_tokens >= 10"
      - op: fingerprint
      - op: dedup_exact
        keys: fingerprint
        id: doc_id
      - op: chunk
        chunk_tokens: 32
        stride: 24
        id_cols: [doc_id, lang]
"""

SF = "/root/testdata/sf0.001"


def test_yaml_transforms_equal_hand_built(spark):
    p = Pipeline(yaml.safe_load(SPEC))
    out = p.compile(spark, path_vars={"sf": SF})[0]["curate"]

    docs = load_table(spark, SF, "documents")
    hand = tx.quality_features(docs).where("n_tokens >= 10")
    hand = tx.fingerprint(hand)
    hand = dd.exact_dedup(hand, "fingerprint", "doc_id")
    hand = tx.chunk_documents(hand, chunk_tokens=32, stride=24, id_cols=["doc_id", "lang"])

    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in hand.collect()}
    assert got == want and len(got) > 0


def test_yaml_transform_unknown_op_raises(spark):
    import pytest

    bad = yaml.safe_load(SPEC.replace("op: quality", "op: frobnicate"))
    with pytest.raises(ValueError, match="frobnicate"):
        Pipeline(bad).compile(spark, path_vars={"sf": SF})


PACK_SPEC = """
pipeline_name: shard_prep
stages:
  scrub_and_pack:
    description: boilerplate scrub stats + packing manifest, from config
    input:
      format: parquet
      path: "{sf}/documents.parquet"
    transforms:
      - op: pack_sequences
        seq_tokens: 128
        part_col: lang
"""


def test_yaml_pack_sequences_equals_operator(spark):
    p = Pipeline(yaml.safe_load(PACK_SPEC))
    out = p.compile(spark, path_vars={"sf": SF})[0]["scrub_and_pack"]
    hand = tx.pack_sequences(
        load_table(spark, SF, "documents").select("lang", "doc_id", "text"),
        seq_tokens=128,
    )
    got = {(r["lang"], r["doc_id"]): (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    want = {(r["lang"], r["doc_id"]): (r["seq_id"], r["seq_offset"]) for r in hand.collect()}
    assert got == want and len(got) > 0


BP_SPEC = """
pipeline_name: scrub_demo
stages:
  scrub:
    description: repeated-block removal from config
    input:
      format: parquet
      path: "{sf}/documents.parquet"
    transforms:
      - op: boilerplate_scrub
        block_tokens: 4
        min_docs: 3
"""


def test_yaml_boilerplate_scrub_equals_operator(spark):
    p = Pipeline(yaml.safe_load(BP_SPEC))
    out = p.compile(spark, path_vars={"sf": SF})[0]["scrub"]
    hand = tx.boilerplate_scrub(
        load_table(spark, SF, "documents").select("doc_id", "text"),
        block_tokens=4, min_docs=3,
    )
    got = {r["doc_id"]: (r["n_blocks"], r["n_dropped"]) for r in out.collect()}
    want = {r["doc_id"]: (r["n_blocks"], r["n_dropped"]) for r in hand.collect()}
    assert got == want and len(got) > 0


RP_SPEC = """
pipeline_name: proj_demo
stages:
  proj:
    description: JL projection + budget from config
    input:
      format: parquet
      path: "{sf}/embeddings.parquet"
    transforms:
      - op: random_projection
        out_dim: 8
"""

BUDGET_SPEC = """
pipeline_name: budget_demo
stages:
  alloc:
    description: Hamilton budget from config
    input:
      format: parquet
      path: "{sf}/documents.parquet"
    transforms:
      - op: allocate_token_budget
        budget: 999983
"""


def test_yaml_random_projection_equals_operator(spark):
    from odp_dynamic_data_pipeline_spark.operators.similarity import random_projection

    p = Pipeline(yaml.safe_load(RP_SPEC))
    out = p.compile(spark, path_vars={"sf": SF})[0]["proj"]
    hand = random_projection(
        load_table(spark, SF, "embeddings"), out_dim=8
    )
    got = {r["vec_id"]: list(r["proj"]) for r in out.collect()}
    want = {r["vec_id"]: list(r["proj"]) for r in hand.collect()}
    assert got == want and len(got) > 0


def test_yaml_token_budget_quota_exact(spark):
    p = Pipeline(yaml.safe_load(BUDGET_SPEC))
    out = p.compile(spark, path_vars={"sf": SF})[0]["alloc"].collect()
    assert sum(r["quota_tokens"] for r in out) == 999983


def test_shipped_corpus_pipeline_compiles_and_curates(spark):
    """The shipped corpus_curation_pipeline.yaml compiles to lazy plans
    whose results match the hand-built operator chain."""
    from odp_dynamic_data_pipeline_spark.operators.dedup import exact_dedup
    from odp_dynamic_data_pipeline_spark.plans.pipeline import load_pipeline

    pipe = load_pipeline("pipelines/corpus_curation_pipeline.yaml")
    outs, _ = pipe.compile(spark, path_vars={"sf": SF})
    chunks = outs["curate"]
    budget = outs["budget"].collect()
    vecs = outs["vectors"]

    # budget stage: Hamilton invariant
    assert sum(r["quota_tokens"] for r in budget) == 10_000_000

    # vectors stage: projection + int8 columns exist, row count preserved
    n_emb = load_table(spark, SF, "embeddings").count()
    assert vecs.count() == n_emb
    assert {"proj", "codes", "scale"} <= set(vecs.columns)

    # curate stage: same chunk count as the hand-built chain
    hand = tx.quality_features(load_table(spark, SF, "documents"))
    hand = hand.where("n_tokens >= 5 AND 1000000 * n_unique_tokens >= 200000 * n_tokens")
    hand = tx.scrub_pii(hand)
    hand = tx.fingerprint(hand)
    hand = exact_dedup(hand, ["fingerprint"], "doc_id")
    hand = tx.chunk_documents(hand, chunk_tokens=64, stride=48, id_cols=["doc_id", "lang"])
    assert chunks.count() == hand.count() > 0


def test_yaml_cyclic_mapping_dependency_raises(spark):
    """Two stages each consuming the mapping the other produces must fail
    LOUDLY at plan time (graphlib.CycleError), never hang or pick an
    arbitrary order -- the config-error contract of the compiler."""
    import graphlib

    import pytest

    cyclic = yaml.safe_load(
        """
pipeline_name: cyclic_demo
stages:
  a:
    description: consumes b's mapping, produces a's
    input: {format: parquet, path: "%s/documents.parquet"}
    mappings:
      read: [{name: from_b, key: doc_id}]
      write: [{name: from_a, key: doc_id, value: [lang]}]
  b:
    description: consumes a's mapping, produces b's
    input: {format: parquet, path: "%s/documents.parquet"}
    mappings:
      read: [{name: from_a, key: doc_id}]
      write: [{name: from_b, key: doc_id, value: [lang]}]
"""
        % (SF, SF)
    )
    with pytest.raises(graphlib.CycleError):
        Pipeline(cyclic)
