"""Driver-contract invariants for __spark_entry__ (the file the driver
actually imports): the rotation must cover every registered query exactly
once, never lose an oracle, and front-load the queries that still need a
driver hash row."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queries_cover_registry_exactly_once():
    from odp_dynamic_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

    e = _entry()
    q = e.queries()
    assert set(q) == set(SPARK_QUERIES)
    assert len(q) == len(SPARK_QUERIES)
    o = e.oracle_sql()
    assert set(o) == set(ORACLE_SQL)
    assert set(o) <= set(q)
    # the deliberate rows-only set stays exactly the xxhash64 perf paths,
    # EACH with a hash-gated md5 twin of the same algebra (dedup_minhash_md5,
    # dedup_simhash_md5, incremental_neardup_md5_stream); similarity_lsh_topk
    # left this set in r10 -- its hyperplane sign matrix is a plan literal,
    # so the oracle replays it directly
    assert set(q) - set(o) == {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "incremental_neardup_stream",
    }


def test_rotation_frontloads_uncovered_queries():
    """Every query without a fully-green driver row in any recorded
    CORRECTNESS artifact must sort before every covered one (the driver
    samples a prefix per round, so this ordering is what makes the union
    converge)."""
    e = _entry()
    covered = e._driver_covered()
    order = list(e.queries())
    first_covered = next((i for i, n in enumerate(order) if n in covered), len(order))
    stragglers = [n for n in order[first_covered:] if n not in covered]
    assert stragglers == [], f"uncovered queries sorted after covered ones: {stragglers}"
