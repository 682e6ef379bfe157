"""Python DataSource write path: two-phase commit visibility."""

from __future__ import annotations

import glob
import os

from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources


def test_jsonl_pysink_commit_leaves_no_tmp(spark, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id AS doc_id", "CAST(id % 7 AS STRING) AS lang")
    df.repartition(4).write.format("jsonl_pysink").option("path", out).mode("append").save()
    finals = glob.glob(os.path.join(out, "*.jsonl"))
    tmps = glob.glob(os.path.join(out, "*.tmp"))
    assert tmps == [], "commit must rename every temp file"
    assert len(finals) == 4
    back = (
        spark.read.schema("doc_id bigint, lang string")
        .option("pathGlobFilter", "*.jsonl")
        .json(out)
    )
    assert back.count() == 100
    assert back.selectExpr("sum(doc_id)").first()[0] == 4950


def test_jsonl_pysink_commit_sweeps_retry_orphans(tmp_path):
    """A task that fails once then succeeds on retry leaves its failed
    attempt's .tmp with NO commit message naming it -- commit() must sweep
    such orphans while renaming exactly the committed set."""
    from odp_dynamic_data_pipeline_spark.sources.pyds import JsonlSinkWriter, _JsonlCommit

    out = tmp_path / "sink"
    out.mkdir()
    committed = out / "part-00000-aaaa.jsonl.tmp"
    committed.write_text('{"doc_id": 1}\n')
    orphan = out / "part-00001-dead.jsonl.tmp"
    orphan.write_text('{"doc_id": 999}\n')

    w = JsonlSinkWriter({"path": str(out)})
    w.commit([_JsonlCommit(str(committed))])

    names = sorted(p.name for p in out.iterdir())
    assert names == ["part-00000-aaaa.jsonl"], names
