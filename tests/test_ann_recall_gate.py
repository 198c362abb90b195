"""ANN recall regression gate (tools/ann_recall.py promoted to a
failing test, per the round-3 review).

Floors are pinned with margin below the measured values on the
deterministic sf0.001 fixture (fixed query slice, hash-synthesized
LSH planes, seeded KMeans — measured 2026-08-15 after the batched
numpy assignment + deterministic hash-partitioned fit landed:
recall_lsh 0.24 / lift 1.89, recall_ivf 0.68 / lift 1.74,
recall_ivf_fine 0.64 / lift 3.36, recall_pq 0.68 at 32× byte
compression, recall_ivfpq 0.46). A similarity-operator change that degrades recall or
recall-per-scanned-row below these floors now fails the suite instead
of silently shipping a worse index. Absolute recall on this synthetic
corpus is bounded by its weak cosine structure — the LIFT (recall /
scan fraction) is the primary quality signal; >1 means the index
captures real locality.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from conftest import SF_SMOKE

FLOORS = {
    "recall_lsh": 0.15,
    "lift_lsh": 1.3,
    "recall_ivf": 0.45,
    "lift_ivf": 1.5,
    "recall_ivf_fine": 0.55,
    "lift_ivf_fine": 2.5,
    # PQ scans all rows at ~32× fewer bytes/row: recall is the gate,
    # compression the work bound (pinned exactly below)
    "recall_pq": 0.55,
    "pq_compression": 32.0,
    # composed IVF-PQ (measured 0.52 at scan_frac 0.29): cell-pruned
    # AND compressed — recall floor with margin
    "recall_ivfpq": 0.4,
    # round-6 exact re-rank stage: ADC shortlist → true-cosine
    # re-score of shortlist rows only. Measured 1.0 (PQ) / 0.95
    # (IVF-PQ at nprobe_rerank=12) here; at sf0.1 the committed
    # artifact shows PQ 0.95 @ 0.081 and IVF-PQ 0.935 @ 0.076
    # byte-equivalent scan (ANN_RECALL_r7.json) — both rerank paths
    # clear the ≥0.9 @ ≤10%-bytes scale bar, gated here.
    "recall_pq_rerank": 0.9,
    "recall_ivfpq_rerank": 0.9,
    # round-8: the plain LSH / IVF-Flat paths composed with the same
    # exact-rerank stage (codes attached at build, wide probe over
    # code bytes, true cosine on the shortlist). Measured here:
    # lsh_rerank 0.98 (query-directed probe budget 56/64 buckets),
    # ivf_rerank 0.96 (nprobe 12/16) — up from the unreranked 0.24 /
    # 0.68 rows. Floors at the same ≥0.9 bar as the PQ rerank paths.
    "recall_lsh_rerank": 0.9,
    "recall_ivf_rerank": 0.9,
}


@pytest.fixture(scope="module")
def recall(spark):
    from ann_recall import measure

    return measure(spark, SF_SMOKE, k=10)


@pytest.mark.parametrize("metric,floor", sorted(FLOORS.items()))
def test_ann_recall_floor(recall, metric, floor):
    assert recall[metric] >= floor, (
        f"{metric}={recall[metric]} fell below pinned floor {floor} "
        f"(full measurement: {recall})"
    )


def test_scan_fractions_stay_sublinear(recall):
    """The approximate paths must actually examine a minority of the
    corpus — an 'index' that scans everything trivially maxes recall
    and would invalidate the lift floors."""
    assert recall["scan_frac_lsh"] < 0.5
    assert recall["scan_frac_ivf"] < 0.5
    assert recall["scan_frac_ivf_fine"] < 0.5
    assert recall["scan_frac_ivfpq"] < 0.5
