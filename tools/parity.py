"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive multiset of row values.  Stricter than any plausible
driver hash: numeric values must match EXACTLY (the engine is engineered for
bit-identical results via integer-exact aggregation), so passing here
implies passing any tolerance-based comparison.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from odp_dynamic_data_pipeline_spark.session import get_spark  # noqa: E402
from odp_dynamic_data_pipeline_spark.sources.catalog import TABLES  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in idx) for r in rows)


def compare(name, spark, con, sf_dir, spark_fn, oracle):
    t0 = time.time()
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    if oracle is None:
        return {"name": name, "status": "rows-only", "rows": len(srows), "t_spark": round(t_spark, 2)}
    t0 = time.time()
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t_duck = time.time() - t0
    problems = []
    # Driver-faithful dtype check: the driver materializes both sides to
    # pandas before hashing, so a DuckDB HUGEINT (-> float64 in pandas) vs a
    # Spark BIGINT (-> int64) hash-mismatches even when values are equal.
    # Derived WITHOUT re-executing either side: DuckDB types come from a
    # plan-only DESCRIBE, Spark types from sdf.schema, and the
    # nullable-integer -> float64 pandas promotion from nulls already
    # observed in the fetched rows.
    try:
        dtypes = {r[0]: str(r[1]) for r in con.execute(f"DESCRIBE {oracle}").fetchall()}
    except Exception as exc:  # pragma: no cover - DESCRIBE unsupported edge
        dtypes = {}
        print(f"[!] {name}: dtype guard skipped (DESCRIBE failed: {exc})", flush=True)
    if dtypes:
        from pyspark.sql.types import FractionalType, IntegralType

        _INT_TYPES = {
            "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
        }

        def num_class(kind: str, has_null: bool) -> str | None:
            # pandas numeric class ('int'/'float') as .df()/toPandas() maps
            # it; exact type-name matching (a substring test would classify
            # INTERVAL as integer-like)
            t = kind.upper()
            if t in ("DOUBLE", "FLOAT", "REAL", "HUGEINT", "UHUGEINT") or t.startswith(
                "DECIMAL"
            ):
                return "float"
            if t in _INT_TYPES:
                return "float" if has_null else "int"
            return None

        d_null = {c: any(r[i] is None for r in drows) for i, c in enumerate(dcols)}
        s_null = {c: any(r[i] is None for r in srows) for i, c in enumerate(scols)}
        for f in sdf.schema.fields:
            if f.name not in dtypes:
                continue
            if isinstance(f.dataType, IntegralType):
                sc = "float" if s_null.get(f.name) else "int"
            elif isinstance(f.dataType, FractionalType):
                sc = "float"
            else:
                sc = None
            dc = num_class(dtypes[f.name], d_null.get(f.name, False))
            if sc != dc and (sc or dc):
                problems.append(
                    f"pandas dtype mismatch on '{f.name}': duck={dtypes[f.name]} "
                    f"-> {dc} spark={f.dataType.simpleString()} -> {sc} "
                    "(driver hash will diverge; CAST the oracle)")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    if not problems:
        ms, md = rows_multiset(scols, srows), rows_multiset(dcols, drows)
        if ms != md:
            diff_s = list((ms - md).items())[:3]
            diff_d = list((md - ms).items())[:3]
            problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return {
        "name": name,
        "status": "OK" if not problems else "FAIL",
        "rows": len(srows),
        "t_spark": round(t_spark, 2),
        "t_duck": round(t_duck, 2),
        "problems": problems,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as ent

    qs, oracles = ent.queries(), ent.oracle_sql()
    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare(name, spark, con, sf_dir, fn, oracles.get(name))
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "problems": [repr(e)[:500]]}
        flag = {"OK": "+", "rows-only": "~", "FAIL": "!", "ERROR": "!"}[r["status"]]
        print(f"[{flag}] {r['name']}: {r['status']} rows={r.get('rows')} "
              f"t_spark={r.get('t_spark')}s t_duck={r.get('t_duck')}s")
        for p in r.get("problems", []):
            print(f"      {p}")
            failed += 1
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
