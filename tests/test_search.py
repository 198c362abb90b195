"""Persisted inverted-index BM25 search (operators/search.py):
ranking parity against a pure-python reference scorer, and static
partition pruning of the postings scan to the query's token buckets.
"""

from __future__ import annotations

import math
import re

import pytest

from stock_prediction_data_engineering_spark.operators.search import (
    search_index_expire,
    search_index_query,
    search_index_write,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the fox and the hound run through the forest"),
        (2, "a lazy afternoon nap in the warm sun with the dog"),
        (3, "spark shuffles partition data across executors"),
        (4, "fox fox fox den in the forest undergrowth"),
        (5, "dogs and cats living together in one house"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_reference(rows, query_terms, k1=1.2, b=0.75):
    """Plain-python BM25 over (doc_id, text) rows — the oracle for the
    distributed scorer (log prevents a SQL oracle)."""
    docs = {
        i: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for i, t in rows
    }
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    scores: dict[int, float] = {}
    for term in query_terms:
        df = sum(1 for ws in docs.values() if term in ws)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ws in docs.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
            scores[i] = scores.get(i, 0.0) + idf * tfn
    return scores


def test_bm25_matches_reference_scorer(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    search_index_write(corpus, path)
    terms = ["fox", "dog"]
    got = {
        r.id: r.score
        for r in search_index_query(spark, path, terms, top_k=10).collect()
    }
    want = _bm25_reference(
        [(r.doc_id, r.text) for r in corpus.collect()], terms
    )
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # engine and reference agree on the ranking (doc 0 matches BOTH
    # terms and outranks the term-stuffed fox-only doc 4 — tf
    # saturation working as intended); no-term doc 3 never appears
    assert max(got, key=got.get) == max(want, key=want.get)
    assert sorted(got, key=got.get) == sorted(want, key=want.get)
    assert 3 not in got


def test_search_handles_absent_terms(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    search_index_write(corpus, path)
    assert (
        search_index_query(spark, path, ["zzzmissing"], top_k=5).count() == 0
    )


def test_search_scan_prunes_to_query_buckets(spark, corpus, tmp_path):
    """The postings/terms scans must carry a bucket partition filter so
    only the query terms' directories are listed/read."""
    path = str(tmp_path / "idx")
    search_index_write(corpus, path)
    df = search_index_query(spark, path, ["forest"], top_k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PushedFilters")[0]
    # and the result is still correct under pruning
    got = {r.id for r in df.collect()}
    assert got == {1, 4}


def test_search_rebuild_is_atomic_and_keeps_superseded_build(
    spark, corpus, tmp_path
):
    """Rebuilding publishes via one CURRENT-pointer swap; the
    superseded build SURVIVES the rebuild (Spark reads are lazy — a
    reader that resolved CURRENT before the rebuild executes after
    it), and is reclaimed only by the explicit expire step."""
    import os

    path = str(tmp_path / "idx")
    search_index_write(corpus, path)
    first_builds = {
        d for d in os.listdir(path) if d.startswith("build-")
    }
    assert len(first_builds) == 1
    # a lazy reader resolves CURRENT *before* the rebuild...
    stale_reader = search_index_query(spark, path, ["fox"], top_k=10)
    search_index_write(corpus.limit(3), path, n_buckets=8)
    builds = {d for d in os.listdir(path) if d.startswith("build-")}
    assert builds > first_builds and len(builds) == 2
    with open(os.path.join(path, "CURRENT")) as fh:
        live = fh.read().strip()
    assert live in builds and live not in first_builds
    # ...and executes *after* it: still sees one self-consistent
    # (old) build instead of crashing on deleted files
    assert {r.id for r in stale_reader.collect()} == {0, 1, 4}
    # a fresh query reflects the new build (doc 4 excluded by limit(3))
    got = {r.id for r in search_index_query(spark, path, ["fox"]).collect()}
    assert got == {0, 1}
    # explicit retention reclaims the superseded build
    doomed = search_index_expire(path, keep_last=0)
    assert set(doomed) == first_builds
    left = {d for d in os.listdir(path) if d.startswith("build-")}
    assert left == {live}
    # the live build is never expired, whatever keep_last says
    assert search_index_expire(path, keep_last=0) == []


def test_search_expire_skips_in_flight_builds(corpus, tmp_path):
    """Expire never rmtrees a concurrent rebuilder's in-flight work: a
    build dir WITHOUT meta.json (the last file a build writes before
    publishing) is skipped however old its mtime is — only superseded
    COMPLETE builds age out."""
    import os

    path = str(tmp_path / "idx")
    search_index_write(corpus, path)
    search_index_write(corpus.limit(3), path)
    # a concurrent rebuilder mid-build: postings on disk, no meta yet,
    # mtime OLDER than every complete build (worst case for mtime aging)
    inflight = os.path.join(path, "build-99999-0")
    os.makedirs(os.path.join(inflight, "postings"))
    os.utime(inflight, times=(0, 0))
    doomed = search_index_expire(path, keep_last=0)
    assert os.path.isdir(inflight), "in-flight build must survive expire"
    assert "build-99999-0" not in doomed
    # the superseded complete build DID age out
    assert len(doomed) == 1


def test_search_empty_result_schema_matches_corpus_id_type(
    spark, tmp_path
):
    """The empty-index fast path must mint the id type persisted at
    build time (string ids stay string — unionable with the non-empty
    path), not a hardcoded bigint."""
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [], "doc_id string, text string"
    )
    search_index_write(docs, path)
    out = search_index_query(spark, path, ["fox"], top_k=5)
    assert dict(out.dtypes) == {"id": "string", "score": "double"}
    assert out.count() == 0


def test_search_empty_corpus_yields_valid_empty_index(spark, corpus, tmp_path):
    """An all-empty corpus must publish a queryable index that returns
    zero rows — not a meta.json with total_len=None that crashes the
    query path."""
    path = str(tmp_path / "idx")
    search_index_write(corpus.limit(0), path)
    assert search_index_query(spark, path, ["fox"], top_k=5).count() == 0


def test_search_write_opt_in_auto_expire_bounds_builds(corpus, tmp_path):
    """With expire_keep_last=N, a rebuild loop never accumulates more
    than live + N superseded build-* dirs; the default (None) keeps
    every superseded build for explicit reclaim."""
    import os

    path = str(tmp_path / "idx")
    for _ in range(4):
        search_index_write(corpus, path)
    assert (
        len([d for d in os.listdir(path) if d.startswith("build-")]) == 4
    )
    for _ in range(3):
        search_index_write(corpus, path, expire_keep_last=1)
    builds = [d for d in os.listdir(path) if d.startswith("build-")]
    assert len(builds) == 2  # live + 1 grace build
    with open(os.path.join(path, "CURRENT")) as fh:
        assert fh.read().strip() in builds
