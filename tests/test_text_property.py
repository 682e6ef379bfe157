"""New text/corpus operators vs pure-Python references on deterministic
pseudo-random corpora (small alphabet to force word/pair collisions)."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from odp_dynamic_data_pipeline_spark.operators.text import (
    bpe_merge_step,
    hashed_linear_score,
    shard_assignment,
    zipf_coverage,
)


def _trunc_div(a: int, b: int) -> int:
    # Spark's div truncates toward zero; Python's // floors
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _corpus(rng, n_docs):
    docs = []
    for i in range(n_docs):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(0, 8))
        ]
        docs.append((i, " ".join(words)))
    return docs


def test_bpe_merge_step_matches_reference(spark):
    rng = random.Random(11)
    docs = _corpus(rng, 30)
    wf = Counter(w for _, t in docs for w in t.split())
    pc: Counter = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += f
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = (
        bpe_merge_step(spark.createDataFrame(docs, "doc_id long, text string"), top_k=10)
        .orderBy("rank")
        .collect()
    )
    assert [(r["pair"], r["pair_count"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_zipf_coverage_matches_reference(spark):
    rng = random.Random(13)
    docs = _corpus(rng, 40)
    tf = Counter(w for _, t in docs for w in t.split())
    total = sum(tf.values())
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    cum = 0
    want = []
    for r, (tok, n) in enumerate(ranked, 1):
        cum += n
        want.append((r, tok, n, cum, 1_000_000 * cum // total))
    got = (
        zipf_coverage(spark.createDataFrame(docs, "doc_id long, text string"), top_k=15)
        .orderBy("rank")
        .collect()
    )
    assert [tuple(r) for r in got] == want


def test_hashed_linear_score_matches_reference(spark):
    rng = random.Random(17)
    docs = _corpus(rng, 30)
    want = {}
    for i, t in docs:
        toks = t.split()
        if not toks:
            continue
        s = sum(
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 2001 - 1000
            for w in toks
        )
        want[i] = (len(toks), s, _trunc_div(1_000_000 * s, len(toks)), s > 0)
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"], r["score_e6"], r["keep"])
        for r in hashed_linear_score(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert got == want


def test_shard_assignment_matches_reference(spark):
    ids = list(range(137))
    seed, n_shards = 5, 8
    keyed = [(i, hashlib.md5(f"{seed}:{i}".encode()).hexdigest()) for i in ids]
    want = {}
    by_shard: dict[int, list] = {}
    for i, k in keyed:
        by_shard.setdefault(int(k[:8], 16) % n_shards, []).append((k, i))
    for s, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members), 1):
            want[i] = (s, pos)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignment(df, seed=seed, n_shards=n_shards).collect()
    }
    assert got == want
