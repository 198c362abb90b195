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


def encode_words(
    words: DataFrame, merges: list[Row] | list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge table to a (word, weight) vocabulary:
    returns (word, weight, toks array<string>) — each distinct word's
    BPE token sequence.

    Semantics: merges apply in RANK ORDER, each merging all its
    non-overlapping occurrences left-to-right before the next rank
    (the single-pass fold ``_merge_expr`` pins; the same rule the
    trainer used, so train->encode round-trips bit-identically).

    Scale shape — the point of encoding the VOCABULARY, not the
    corpus: merge application is K interpreted folds over the
    vocabulary-sized distinct-word table (Heaps' law: sublinear in
    corpus size); the corpus-sized pass is only the upstream word
    count and the downstream word->toks join, both keyed hash
    operations. Encoding the corpus row-by-row would re-run the K
    folds once per token occurrence instead of once per distinct
    word. Lineage is truncated every few rounds (lazy localCheckpoint
    — the learn_bpe / connected-components pattern) so the plan tree
    does not deepen with the merge count.
    """
    enc = words.select(
        "word",
        "weight",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias(
            "syms"
        ),
    )
    for i, m in enumerate(merges):
        left, right = m["left"], m["right"]
        enc = enc.select(
            "word", "weight", F.expr(_merge_expr(left, right)).alias("syms")
        )
        if (i + 1) % 8 == 0:
            enc = enc.localCheckpoint(eager=False)
    return enc.withColumnRenamed("syms", "toks")


def encode_corpus_token_counts(
    docs: DataFrame,
    merges: list[Row] | list[tuple[str, str]],
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus token frequencies under a learned BPE merge table:
    (token, n_occurrences) for the top_k most frequent tokens, ordered
    (n desc, token) — deterministic under any partitioning.

    One corpus scan (word frequencies), vocabulary-sized encoding,
    then token counts weighted by word frequency — the token histogram
    a tokenizer-fit pipeline reports without ever materializing the
    encoded corpus."""
    wf = word_frequencies(docs, text_col)
    enc = encode_words(wf, merges)
    return (
        enc.select(F.explode("toks").alias("token"), "weight")
        .groupBy("token")
        .agg(F.sum("weight").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(top_k)
    )
