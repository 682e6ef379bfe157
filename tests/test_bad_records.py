from __future__ import annotations

from odp_dynamic_data_pipeline_spark.sources.readers import read_json
from odp_dynamic_data_pipeline_spark.sources.schemas import LOG_SCHEMA


def test_corrupt_records_quarantined(spark, tmp_path):
    p = tmp_path / "logs.json"
    p.write_text(
        '{"logId": "l1", "spanId": "s1", "timestamp": "2024-11-16T12:00:00Z", '
        '"message": "ok", "level": "INFO", "processingTimeMs": 10, "eventType": "INFO"}\n'
        '{"logId": "l2", "processingTimeMs": "NOT_A_NUMBER"}\n'
    )
    df = read_json(spark, str(p), LOG_SCHEMA, multiline=False, corrupt_record_col="_corrupt")
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert [r["logId"] for r in good] == ["l1"]
    assert len(bad) == 1 and "NOT_A_NUMBER" in bad[0]["_corrupt"]
