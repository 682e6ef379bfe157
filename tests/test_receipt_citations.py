"""Receipt-citation integrity (VERDICT r11 item 2): every scale receipt
that SCALE.md / the latest NOTES cite by name must actually exist in the
committed SCALE_REHEARSAL.json.

Why: tools/scale_rehearsal.py used to rewrite the artifact wholesale, and
the r11 end-of-round default run silently dropped the ``day_rehearsal_24h``
and ``store_growth_*`` rows that the prose still cited (they survived only
in git history).  The tool now always merge-writes; this test makes any
future regression loud by failing the moment a cited receipt vanishes.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _receipt_queries() -> dict:
    with open(os.path.join(REPO, "SCALE_REHEARSAL.json")) as f:
        return json.load(f)["queries"]


def _latest_notes() -> str:
    paths = glob.glob(os.path.join(REPO, "NOTES_r*.md"))
    # NOTES_r4.md .. NOTES_r11.md: numeric sort on the round number
    paths.sort(key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    return paths[-1] if paths else ""


def _cited_docs() -> str:
    text = open(os.path.join(REPO, "SCALE.md")).read()
    notes = _latest_notes()
    if notes:
        text += "\n" + open(notes).read()
    return text


def test_named_receipt_families_exist():
    """Hard-named receipt rows (day rehearsal, per-family store growth):
    any mention anywhere in the docs requires a committed row."""
    queries = _receipt_queries()
    text = _cited_docs()
    cited = set(re.findall(r"\b(day_rehearsal_24h|store_growth_[a-z_]+\w)\b", text))
    missing = sorted(c for c in cited if c not in queries)
    assert not missing, (
        f"docs cite scale receipts {missing} that are not in"
        " SCALE_REHEARSAL.json -- a receipt rewrite dropped them"
        " (restore from git history or re-run the rehearsal tool)"
    )


def test_exponent_cited_queries_have_receipts():
    """Backticked registered-query names on SCALE.md lines that claim an
    exponent must have a rehearsal row (the claim's evidence)."""
    from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

    queries = _receipt_queries()
    missing = []
    for line in open(os.path.join(REPO, "SCALE.md")):
        if "exponent" not in line:
            continue
        for name in re.findall(r"`([a-z0-9_]+)`", line):
            if name in SPARK_QUERIES and name not in queries:
                missing.append(name)
    assert not missing, (
        f"SCALE.md claims measured exponents for {sorted(set(missing))} but"
        " SCALE_REHEARSAL.json has no row for them"
    )


def test_day_rehearsal_receipt_shape():
    """The restored 24h receipt keeps the fields NOTES/SCALE cite."""
    row = _receipt_queries().get("day_rehearsal_24h")
    assert row is not None, "day_rehearsal_24h receipt missing again"
    for field in ("replay_identical", "cc_matches_oneshot_batch", "flatness_ratio"):
        assert field in row, f"day_rehearsal_24h receipt lost field {field!r}"
    assert row["replay_identical"] is True
    assert row["cc_matches_oneshot_batch"] is True
