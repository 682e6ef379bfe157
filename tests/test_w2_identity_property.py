"""Property-based validation of the W2 window-algebra identity.

The oracle SQL used by tlb_session_metrics / sessionize_exact_pandas rests
on one claim: *the register is live iff the latest prior start is newer than
the latest prior end*.  Hypothesis drives hundreds of random event tapes
through DuckDB's window engine (fast, no Spark) and compares against the
reference's literal register walk (src/batch_tlb.py:50-62 semantics).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

IDENTITY_SQL = """
WITH w AS (
  SELECT uid, seq, typ, ts,
         MAX(CASE WHEN typ = 'S' THEN ts END) OVER win AS prev_start,
         MAX(CASE WHEN typ = 'E' THEN ts END) OVER win AS prev_end
  FROM events
  WINDOW win AS (PARTITION BY uid ORDER BY ts, seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT uid, ts - prev_start AS dur
FROM w
WHERE typ = 'E' AND prev_start IS NOT NULL
  AND (prev_end IS NULL OR prev_start > prev_end)
ORDER BY uid, ts
"""


def register_walk(rows):
    out = []
    by_uid = {}
    for uid, seq, typ, ts in rows:
        by_uid.setdefault(uid, []).append((ts, seq, typ))
    for uid in sorted(by_uid):
        last = None
        for ts, _, typ in sorted(by_uid[uid]):
            if typ == "S":
                last = ts
            elif typ == "E" and last is not None:
                out.append((uid, ts - last))
                last = None
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # uid
        st.sampled_from(["S", "E", "X"]),                  # type (X = other)
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_window_identity_equals_register_walk(tape):
    # unique, increasing timestamps (the testdata has unique event times)
    rows = [(uid, i, typ, 10 * i) for i, (uid, typ) in enumerate(tape)]
    con = duckdb.connect()
    con.execute("CREATE TABLE events (uid INT, seq INT, typ VARCHAR, ts BIGINT)")
    if rows:
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    got = [(r[0], r[1]) for r in con.execute(IDENTITY_SQL).fetchall()]
    assert got == register_walk(rows)
