"""Per-query bench drift gate (VERDICT r6 item 4).

Compares a bench run's per-query COLD timings against the best prior
recorded cold time for the same query across every round artifact
(BENCH_LOCAL_r*.json -- the full maps bench.py writes; the driver's
BENCH_r*.json tails are truncated JSON and are ignored).  A query is
FLAGGED when it is more than ``--ratio`` (default 2.0) times its best
prior AND the absolute regression exceeds ``--floor`` seconds (default
1.0 -- sub-second jitter on a shared host is noise, not drift).

Streaming queries (name contains "stream") are reported but never flagged:
their warm floor is micro-batch engine machinery, adjudicated in PLANS.md
round 6 (isolated fresh-JVM measurements in STREAM_BENCH_LOCAL.json put
even trivial streaming plans at 1.5-4.5 s warm), so a shared-session
uptick there is JVM pressure, not a plan change.  A flagged batch query
whose WARM re-run (queries_warm) is back inside the ratio is downgraded
to "jit-noise": the cold number was per-query codegen/JIT, measured at
1-5 s on this container (SCALE.md "Cold-run tax").

Usage:
    python tools/bench_drift.py [current.json]   # default BENCH_LOCAL.json
Exit 1 iff any hard flag survives the downgrades.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _load(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.loads(f.read().strip().splitlines()[-1])
    except (OSError, json.JSONDecodeError, IndexError):
        return None


def best_prior(repo: str, exclude: str) -> dict[str, tuple[float, str]]:
    """name -> (best cold sec, source file) over all prior full maps."""
    best: dict[str, tuple[float, str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_LOCAL_r*.json"))):
        if os.path.abspath(path) == os.path.abspath(exclude):
            continue
        doc = _load(path)
        if not doc:
            continue
        for name, t in (doc.get("queries") or {}).items():
            if isinstance(t, (int, float)) and t >= 0:
                if name not in best or t < best[name][0]:
                    best[name] = (float(t), os.path.basename(path))
    return best


def main(argv: list[str]) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in argv if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] for a in argv if "=" in a and a.startswith("--")}
    cur_path = args[0] if args else os.path.join(repo, "BENCH_LOCAL.json")
    ratio = float(opts.get("--ratio", "2.0"))
    floor = float(opts.get("--floor", "1.0"))

    cur = _load(cur_path)
    if not cur:
        print(f"bench_drift: cannot read {cur_path}", file=sys.stderr)
        return 2
    prior = best_prior(repo, cur_path)
    if not prior:
        print("bench_drift: no prior BENCH_LOCAL_r*.json maps -- nothing to compare")
        return 0

    warm = cur.get("queries_warm") or {}
    flags: list[str] = []
    notes: list[str] = []
    n_compared = 0
    for name, t in (cur.get("queries") or {}).items():
        if not isinstance(t, (int, float)) or t < 0 or name not in prior:
            continue
        n_compared += 1
        b, src = prior[name]
        if t <= b * ratio or (t - b) <= floor:
            continue
        line = f"{name}: cold {t:.2f}s vs best prior {b:.2f}s ({src}) = {t / max(b, 1e-9):.1f}x"
        if "stream" in name:
            notes.append(f"[stream-floor] {line}")
        elif name in warm and 0 <= warm[name] <= b * ratio:
            notes.append(f"[jit-noise, warm {warm[name]:.2f}s] {line}")
        else:
            flags.append(f"[DRIFT] {line}")

    for n in notes:
        print(n)
    for f in flags:
        print(f)
    print(
        f"bench_drift: {n_compared} compared, {len(flags)} flagged,"
        f" {len(notes)} downgraded (ratio {ratio}x, floor {floor}s)"
    )
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
