"""BPE tokenizer training over a distributed corpus: learn the merge
table (the ordered list of symbol-pair merges) that a byte-pair-
encoding tokenizer is defined by.

How real BPE trainers scale — and how this one maps it to Spark: the
corpus-sized work is ONLY the word-frequency aggregation (one
groupBy(word).count() scan); everything after runs on the distinct-
word table, which is vocabulary-sized (Heaps' law: sublinear in
corpus size — a 100 TB corpus still has a vocab that fits a modest
cluster easily). Each merge round is:

  1. explode every distinct word's symbol sequence into adjacent
     pairs, weighted by word frequency → keyed sum per pair;
  2. global argmax pair (count desc, then lexicographic — the
     deterministic tie-break every reimplementation must pin);
  3. rewrite the symbol sequences with the winning pair merged
     left-to-right (a JVM ``aggregate`` fold per word — interpreted
     higher-order lambda, but over vocabulary-sized data).

The argmax is a driver-side ``.first()`` of a 1-row TakeOrdered —
justified exactly like the ANN query-vector fetch: the merge decision
is a global scalar consumed by the NEXT round's plan, and the
sequential dependence is inherent to BPE (merge k+1 is defined on the
output of merge k). Lineage across rounds is truncated with
``localCheckpoint`` (same pattern as connected components,
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

# end-of-word marker, appended before learning so merges can't cross
# word boundaries (standard BPE convention)
EOW = "</w>"

# adjacent symbol pairs of a `syms` array column, as (left, right) structs
_PAIRS = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)) "
    "ELSE array() END"
)

# left-to-right non-overlapping merge of pair (l, r) inside `syms`:
# fold symbols into an accumulator array, gluing when the accumulator's
# last element is l and the incoming symbol is r. The glued symbol is
# never re-examined, which is exactly BPE's single-pass merge rule.
def _merge_expr(left: str, right: str) -> str:
    l_lit = left.replace("'", "\\'")
    r_lit = right.replace("'", "\\'")
    return (
        "aggregate(syms, cast(array() as array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) >= 1 AND element_at(acc, -1) = '{l_lit}' "
        f"AND s = '{r_lit}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l_lit}{r_lit}')) "
        "ELSE concat(acc, array(s)) END)"
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The corpus-sized pass: (word, weight) over whitespace tokens —
    one explode + one keyed count, map-side partials absorb the heavy
    hitters."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
) -> list[Row]:
    """Learn ``num_merges`` BPE merges; returns rows of
    (rank, left, right, merged, weight) in merge order.

    Ties on pair weight break by (left, right) lexicographic order, so
    the learned table is deterministic on any engine or partitioning.
    """
    vocab = word_frequencies(docs, text_col).select(
        F.concat(
            F.split(F.col("word"), ""),
            F.array(F.lit(EOW)),
        ).alias("syms"),
        "weight",
    )
    vocab = vocab.localCheckpoint()

    merges: list[Row] = []
    for rank in range(num_merges):
        best = (
            vocab.select(F.explode(F.expr(_PAIRS)).alias("p"), "weight")
            .groupBy("p.l", "p.r")
            .agg(F.sum("weight").alias("w"))
            .orderBy(F.col("w").desc(), "l", "r")
            .limit(1)
            .first()
        )
        if best is None:
            break
        merges.append(
            Row(
                rank=rank,
                left=best["l"],
                right=best["r"],
                merged=best["l"] + best["r"],
                weight=int(best["w"]),
            )
        )
        vocab = vocab.select(
            F.expr(_merge_expr(best["l"], best["r"])).alias("syms"),
            "weight",
        ).localCheckpoint()
    return merges
