"""Deduplication family for training-data pipelines (north-star
extension, BASELINE.json): exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale posture (the whole point of these operators):

- every method is shuffle-bounded by *candidate generation* — LSH
  band buckets or signature chunks — never by all-pairs comparison;
- shingling/banding/joins/verification are JVM-side column
  expressions; the one Python touchpoint is the MinHash signature
  kernel, an Arrow-batched numpy matrix op (64 interpreted
  higher-order lambdas cost ~30 s of Janino codegen per plan-cache
  miss and run no faster — see minhash_signature vs
  minhash_signature_np);
- verification (exact Jaccard / hamming / cosine) runs only on
  bucket-colliding pairs, which is the textbook MinHash-LSH design:
  band collisions have probability s^r for true similarity s, so
  the candidate set is tiny relative to n^2.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a document/vector table to the session's shuffle
    parallelism before CPU-heavy per-row work (signatures, bit votes,
    gram explodes). Input split sizing is byte-based, so a small file
    would otherwise pin an expensive pipeline to one task; the explicit
    count also keeps AQE from coalescing it back."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)

# ---------------------------------------------------------------------------
# Shingling + MinHash signatures (JVM-side)


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles of a document as an array column."""
    t = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(k)),
        )
    )


_MERSENNE = 2147483647  # 2^31 - 1: keeps a*h+b inside long range

# Distinct-text count above which minhash_lsh_pairs' exact verify runs
# the Arrow sort+searchsorted kernel instead of JVM array_intersect.
# The kernel wins ~95 us/pair but costs a flat ~1.3 s Python-worker /
# Arrow round-trip per run; candidates scale with distinct text, so
# the crossover (~14 k pairs) maps to a distinct-count gate. Measured:
# d=4,992 (sf0.1/sf1 fixtures) JVM wins by the full constant; d=38,845
# (sf1u) the kernel already wins; d=377 k (sf10u) it wins 12+ s.
_VERIFY_KERNEL_MIN_DISTINCT = 20_000

# Join-strategy gates for sides whose PLANNER estimate is unusable —
# checkpoint-frozen (LogicalRDD keeps the pre-checkpoint guess) or
# aggregate-shrunk — so the static planner would broadcast them at any
# scale (the interval-overlap / winnow estimate-blind class; at sf10u
# it static-broadcast the 6 M-row band table and BOTH ~450 MB shingle
# array tables). The gates key on a MEASURED row count the pipeline
# already has (the duplication profile / rep-table count), against a
# row bound derived from the session's 64 MB broadcast budget and the
# side's per-row width — scale-adaptive, not fixture-tuned:
# ~1.3 KB/row for shingle-hash arrays (≈300 int32s at the corpus'
# ~300-char texts), ~150 B/row for the packed bucket vectors,
# ~50 B/row for id/hash/count metadata. The ARRAY bound is sized from
# guide §3.1's broadcast guidance (a few hundred MB is fine; the hard
# cap is 8 GB / 512 M rows): 400 k rows ≈ 0.5 GB — measured at sf10u
# (377 k distinct): broadcast verify beats the shuffle_hash
# alternative by >4x wall (the pair table amplifies each array ~39x
# through the second attach exchange, ~17 GB vs one 0.5 GB
# broadcast). Above the bound the pipeline degrades gracefully to
# shuffle joins instead of dying in a driver-side build.
_BROADCAST_MAX_ROWS_ARRAY = 400_000
_BROADCAST_MAX_ROWS_PACKED = 400_000
_BROADCAST_MAX_ROWS_META = 1_300_000
# segment-dedup decision tables (~70 B/row: md5 + position struct or
# dropped-position lists): 3 M rows ≈ 200 MB — the measured-good
# broadcast at sf10u's 2.9 M segments; sort-merge beyond
_SEG_BROADCAST_MAX_ROWS = 3_000_000
# inverted-index gram tables (ngram_jaccard): broadcast while the
# corpus stays under ~50 k docs (x ~45 grams/doc x ~50 B/row ~ 100 MB),
# sort-merge beyond — mirrors operators/ssjoin.py's vocab gate
_SSJ_GRAM_BROADCAST_MAX_DOCS = 50_000


def _sized(df: DataFrame, rows: int, budget: int, big: str = "merge") -> DataFrame:
    """Pick the join strategy for ``df`` from a measured row count:
    explicit broadcast under ``budget`` rows (where it provably fits
    and wins), an explicit shuffle-join hint above it (where a static
    broadcast off a frozen estimate would OOM/stall at scale)."""
    return F.broadcast(df) if rows <= budget else df.hint(big)


def shingle_hashes(shingles: Column) -> Column:
    """Base hash per shingle, reduced mod 2^31-1. Each shingle STRING
    is hashed exactly once; the per-seed MinHash values are then cheap
    linear mixes of this base hash (the universal-hashing-family
    construction). Hashing the string once instead of once per seed is
    a ~num_hashes-fold cut in string hashing — the dominant cost of
    signature computation."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def _mix_coeffs(seed: int) -> tuple[int, int]:
    """Deterministic (a, b) for the linear hash family h_i = a*h + b
    mod p: a in [1, p-1], b in [0, p-1]. Knuth multiplicative constants
    keep the seeds well spread; no RNG state, reproducible anywhere."""
    a = (seed * 2654435761 + 1) % (_MERSENNE - 1) + 1
    b = (seed * 40503 + 9176) % _MERSENNE
    return a, b


def hashed_shingle_set(text: Column | str, k: int) -> Column:
    """Each document's DISTINCT hashed k-char shingles as an
    ``array<int>`` — the fused form of
    ``shingle_hashes(char_shingles(...))``.

    Distinct-HASH vs distinct-STRING sets: identical downstream
    everywhere (min-mix, intersect and set sizes are all set functions
    of the hash values; a string-collision duplicate never changes a
    set function) — and deduping AFTER hashing makes array_distinct
    compare ints, not strings.

    int element type: base hashes live in [0, 2^31-2] (pmod by the
    Mersenne prime), so the cast is lossless, and the verify stage's
    array_intersect measures 1.75x faster on int than bigint arrays;
    the numpy signature kernel upcasts to int64 before mixing —
    signatures stay bit-identical.

    Deliberately the ARRAY form, not a flat explode: the per-element
    op here is one xxhash64 of a k-char substring — light enough that
    a flat rewrite (explode + partition-local dedup + re-collect over
    ~240 M rows at sf10u) measured SLOWER (13.9 s vs 9.2 s) than the
    interpreted-lambda cost it removes. Contrast operators/winnow.py,
    whose per-element md5+conv chain is heavy enough that flat wins
    3x there."""
    t = F.col(text) if isinstance(text, str) else text
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: F.pmod(F.xxhash64(t.substr(i, F.lit(k))), F.lit(_MERSENNE))
        .cast("int"),
    )
    return F.array_distinct(grams)


def _mixer(a: int, b: int):
    # closure factory: a default-arg lambda would be seen by PySpark as
    # a multi-argument higher-order lambda and silently receive the
    # element index
    return lambda h: F.pmod(a * h + b, F.lit(_MERSENNE))


def minhash_signature(hashes: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature over pre-hashed shingles
    (see :func:`shingle_hashes`): for seed i, min over shingles of
    (a_i * h + b_i) mod p — as one JVM array expression.

    NOTE: higher-order lambdas are interpreted, not codegen'd; for the
    hot path prefer :func:`minhash_signature_np` (Arrow-batched numpy,
    measured ~5x faster at 64 hashes). This JVM form is kept for
    environments without Arrow and as the semantic reference."""
    return F.array(
        *[
            F.array_min(F.transform(hashes, _mixer(*_mix_coeffs(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_signature_np(num_hashes: int = 64):
    """Arrow-batched numpy MinHash kernel: a (num_hashes × n_shingles)
    broadcasted multiply-mod-min per document. Bit-identical to
    :func:`minhash_signature` (same (a_i, b_i) family, int64-exact:
    a < 2^31 and h < 2^31 so a*h+b < 2^62). The per-doc Python loop is
    amortized — each iteration is one C-level matrix op over the whole
    signature; Arrow moves only the long arrays."""
    from pyspark.sql.types import ArrayType, LongType

    coeffs = [_mix_coeffs(i) for i in range(num_hashes)]
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            arr = np.asarray(h, dtype=np.int64)[None, :]
            out.append(((a_vec * arr + b_vec) % _MERSENNE).min(axis=1))
        return pd.Series(out)

    return _sig


def minhash_signature_packed_np(num_hashes: int = 64, n_buckets: int = 128):
    """The :func:`minhash_signature_np` kernel extended to ALSO emit a
    packed hash-bucket-count vector per document, for the verify
    stage's sound intersection upper bound (see minhash_lsh_pairs):

    - ``sig``    — identical to minhash_signature_np (same family,
      same int64 math, bit-identical);
    - ``packed`` — ``n_buckets`` counts of the doc's shingle hashes by
      ``h & (n_buckets - 1)``, 8 bits each, packed little-endian into
      ``n_buckets / 8`` bigints. NULL if any bucket count exceeds 255
      (the byte cap would silently UNDERstate the bound and make it
      unsound) — the filter treats NULL as "cannot bound, must verify".

    Computing the counts here is one vectorized bincount inside the
    Arrow pass the signatures already pay for — the hash arrays cross
    the Python boundary exactly once either way."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    coeffs = [_mix_coeffs(i) for i in range(num_hashes)]
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
    shifts = np.arange(8, dtype=np.int64) * 8
    mask = n_buckets - 1

    @F.pandas_udf(
        StructType(
            [
                StructField("sig", ArrayType(LongType())),
                StructField("packed", ArrayType(LongType())),
            ]
        )
    )
    def _sigp(hashes: pd.Series) -> pd.DataFrame:
        sigs, packs = [], []
        for h in hashes:
            arr = np.asarray(h, dtype=np.int64)
            sigs.append(((a_vec * arr[None, :] + b_vec) % _MERSENNE).min(axis=1))
            cnt = np.bincount(arr & mask, minlength=n_buckets)
            if cnt.size > n_buckets or cnt.max() > 255:
                packs.append(None)
            else:
                packs.append(
                    (cnt.astype(np.int64).reshape(-1, 8) << shifts).sum(axis=1)
                )
        return pd.DataFrame({"sig": sigs, "packed": packs})

    return _sigp


def _packed_intersect_ub(pa: Column, pb: Column, n_words: int = 16) -> Column:
    """Sound upper bound on |A ∩ B| from two packed bucket-count
    vectors: for ANY partition of the hash space into buckets,
    |A ∩ B| = Σ_b |A_b ∩ B_b| <= Σ_b min(|A_b|, |B_b|). Unpacks and
    mins the 8-bit counts with plain shift/and/least — every op is
    whole-stage-codegen'd long arithmetic, ~128 least() terms per
    pair, orders of magnitude cheaper than the array_intersect it
    gates."""
    terms = []
    for w in range(1, n_words + 1):
        a, b = F.element_at(pa, w), F.element_at(pb, w)
        for j in range(0, 57, 8):
            terms.append(
                F.least(
                    F.shiftright(a, j).bitwiseAND(F.lit(255)),
                    F.shiftright(b, j).bitwiseAND(F.lit(255)),
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _intersect_counts_np(batches):
    """mapInPandas kernel for the LSH verify stage: EXACT
    set-intersection sizes for candidate pairs whose (distinct) hashed
    shingle arrays were attached by the two candidate-bounded joins.

    Why Python here at all: JVM ``array_intersect`` builds a fresh
    hash set per row (measured ~110 us/pair on 600-element int
    arrays); this kernel's per-pair ``np.sort`` + ``searchsorted``
    measures ~15 us, and a one-element cache skips re-sorting
    consecutive rows that share ``id_a`` (both call sites arrange for
    runs: this module repartitions candidates by id_a, and
    operators/ssjoin.py sorts its pairs by id_a within partitions
    before handing them over). Exactness is preserved: both arrays
    are distinct by construction, so the match count IS |A ∩ B| —
    bit-identical to the JVM form; the Jaccard division/round stays
    JVM-side so float semantics never cross the boundary.

    int64 internally, so the same kernel serves both 31-bit shingle
    hashes (this module) and full-range xxhash64 gram hashes
    (operators/ssjoin.py's verify stage).

    A fully-batch-vectorized variant (tag elements with the pair index
    in the int64 high bits, one np.sort per batch, count adjacent
    duplicates) was measured this round and REJECTED: it allocates
    several ~25-50 MB arrays per batch, and on this host glibc mmaps
    and munmaps blocks that size on every free, so each batch pays
    fresh page faults — 19x SLOWER than this loop (1350 vs 15-19
    us/pair quiet, reproduced with per-step timings; an out=-buffered
    variant still measured 21 us/pair). The row loop's small
    arena-recycled temporaries never hit that path. Revisit only with
    an allocator change."""
    for pdf in batches:
        n = len(pdf)
        out = np.zeros(n, dtype=np.int32)
        ids = pdf["id_a"].to_numpy()
        has, hbs = pdf["h_a"], pdf["h_b"]
        last_id, sa = None, None
        for i in range(n):
            b = hbs.iat[i]
            if last_id != ids[i]:
                a = has.iat[i]
                sa = None if a is None else np.sort(np.asarray(a, dtype=np.int64))
                last_id = ids[i]
            if sa is None or sa.size == 0 or b is None or len(b) == 0:
                continue
            bb = np.asarray(b, dtype=np.int64)
            idx = np.searchsorted(sa, bb)
            idxc = np.minimum(idx, sa.size - 1)
            out[i] = np.count_nonzero((sa[idxc] == bb) & (idx < sa.size))
        yield pd.DataFrame(
            {
                "id_a": pdf["id_a"],
                "id_b": pdf["id_b"],
                "n_a": pdf["n_a"],
                "n_b": pdf["n_b"],
                "inter": out,
            }
        )


def _band_table(
    sigs: DataFrame, bands: int, rows_per_band: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(id, sig) -> exploded (id, *extra, band, band_hash) — 24 bytes
    per band plus any passthrough columns, never the signature array
    itself (see minhash_lsh_pairs docstring).

    band_hash is the multi-argument (seed-chained) xxhash64 of the
    band's rows_per_band signature values hashed NATIVELY as longs —
    no cast-to-string/concat round trip (measured ~2x on the band
    stage; the long forms are unambiguous, unlike string concat
    without a separator). band is part of every downstream join key,
    so only within-band collisions matter, at xxhash64's 2^-64. The
    value is also what minhash_index_write persists: build and probe
    must run the same band-hash format, enforced by the index's
    ``_meta.json`` format_version (see _MINHASH_INDEX_FORMAT) —
    bump it if this layout ever changes again."""
    return sigs.select(
        "id",
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at(
                                    F.col("sig"), b * rows_per_band + r + 1
                                )
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", *extra, "b.band", "b.band_hash")


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    output: str = "pairs",
    verify_kernel: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH.

    Pipeline: shingle -> base-hash each shingle once -> 64 linear-mix
    MinHash values -> 16 bands of 4 -> explode bands -> self-join on
    (band, band_hash) for candidates -> verify with Jaccard over the
    hashed shingle sets -> threshold.

    Shuffle discipline (the part that matters at 100 TB): the band
    table carries ONLY (id, band, band_hash) — never the shingle
    arrays — so the 16-way band explode shuffles 24 bytes per band,
    not 16 copies of each document's shingles. Candidate pairs are
    deduplicated first and only then joined back to the (long-typed)
    shingle-hash arrays for verification, so array payloads move
    through exactly one candidate-bounded hash join per side, and the
    verify intersect runs on longs, not strings.

    Returns (id_a, id_b, jaccard) with id_a < id_b, distinct.

    ``output="clusters"`` returns the CLUSTER-level answer instead:
    one row per verified DISTINCT-TEXT pair — (id_a, id_b, jaccard,
    members_a, members_b, n_member_pairs), where ids are cluster
    representatives and exact-dup clusters of size >= 2 appear as
    self-rows (id_a == id_b, jaccard 1.0, n_member_pairs = C(m, 2)).
    This is the scale-safe form for duplicated corpora: the member
    expansion is quadratic in duplicate mass BY THE ANSWER'S OWN
    SEMANTICS (m copies on each side of a dup pair are m^2 real rows),
    so on a 100x-duplicated corpus the pair form's runtime measures
    answer size. The cluster form carries the identical information
    (every member pair is reconstructible from it) in output
    cardinality independent of duplication.

    Exact-duplicate collapse (the production-corpus prefilter,
    engaged ADAPTIVELY — a 1-row duplication profile decides whether
    the collapse pays for itself, so dup-free corpora run the direct
    pipeline with zero expansion overhead): docs are grouped by
    content hash, and the whole LSH pipeline runs
    on ONE representative per distinct text. Identical texts have
    identical shingle sets, signatures, and band hashes, so every
    cross-text pair the full-corpus LSH would find is found through
    the representatives and expanded back to the member ids; pairs
    WITHIN an exact-dup cluster are Jaccard 1.0 by definition (emitted
    without any verify work, and only for texts whose shingle set is
    non-empty — two too-short-to-shingle twins score null, not 1.0,
    exactly as the uncollapsed pipeline did). Real corpora carry
    heavy exact-dup mass (and the sf1 replication fixture is 100%
    duplicated); without the collapse, a cluster of m copies inflates
    candidates by C(m,2) while data grows by m — measured 24.5x time
    for 10x data at sf0.1->sf1, restored to ~linear by this prefilter.
    """
    if output not in ("pairs", "clusters"):
        raise ValueError(f"output must be 'pairs' or 'clusters', got {output!r}")
    if verify_kernel not in ("auto", "arrow", "jvm"):
        raise ValueError(
            f"verify_kernel must be 'auto', 'arrow' or 'jvm', got {verify_kernel!r}"
        )
    rows_per_band = num_hashes // bands
    n_parts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # duplication profile: one 1-row aggregate over (id, content-hash)
    # decides the plan — a corpus with no exact-dup mass skips the
    # collapse machinery entirely (its expansion joins are pure
    # overhead then), the same measure-then-plan move AQE makes.
    # members stays scan-partitioned: md5 over the raw text is cheap
    # relative to a full-corpus repartition, and every consumer is an
    # aggregate or a keyed join that shuffles anyway.
    members = docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col).cast("string")).alias("__th"),
    ).localCheckpoint(eager=False)
    prof_d: int | None = None
    prof_n: int | None = None
    if output == "clusters":
        # cluster output NEEDS the cluster structure — no collapse
        # decision to make, so DON'T pay the (count + countDistinct)
        # profile aggregate here: the interleaved sf1 A/B measured it
        # at ~1.5 s flat on this path (BENCHDIFF_r10_sf1, 1.6x). The
        # verify gate's distinct count is read instead off the rep
        # table the collapse branch materializes anyway (below).
        collapse = True
    else:
        prof = members.agg(
            F.count("*").alias("n"), F.countDistinct("__th").alias("d")
        ).first()
        # collapse pays only when duplicate mass is material: the
        # expansion adds ~4 keyed joins, worth it when clusters shrink
        # the candidate stage, pure overhead for a handful of twins
        collapse = prof.d * 100 <= prof.n * 95
        prof_d = prof.d
        prof_n = prof.n
    if collapse:
        # Representative selection as ONE aggregate instead of
        # [groupBy + semi-join + full rescan]: within a __th group
        # every text is byte-identical, so first(text) is
        # deterministic, and min(id) is the canonical representative.
        # The agg output is hash-distributed by __th across the
        # shuffle parallelism, so the CPU-heavy shingle stage below
        # inherits a balanced layout with no _spread repartition —
        # two full-corpus exchanges and a second scan saved vs the
        # semi-join form.
        rep_docs = (
            docs.groupBy(F.md5(F.col(text_col).cast("string")).alias("__th"))
            .agg(
                F.min(F.col(id_col)).alias("id"),
                F.first(F.col(text_col)).alias("__text"),
            )
            .localCheckpoint(eager=False)
        )
        reps = rep_docs.select("__th", "id")
        # _spread: the rep aggregate's output is hash-distributed by
        # __th, but at small DISTINCT counts AQE coalesces that
        # exchange to ONE partition (few MB of text < the 64 MB
        # advisory size) and the CPU-heavy shingle/signature stages
        # below serialize onto a single task — measured +1.2 s on the
        # sf1 fixture (d=4,992), the real mechanism behind the
        # round-9 "flat small-scale constant". A user-specified
        # repartition is exempt from coalescing; it costs one
        # REP-sized exchange (d rows, never the corpus), noise at
        # sf10u against the stages it parallelizes.
        base_src = _spread(rep_docs.select("id", F.col("__text").alias("__t")))
        if prof_d is None:
            # the distinct count = the rep table's row count: a count
            # over the checkpoint every later stage reuses, so the
            # only added cost is one job dispatch — the rep aggregate
            # itself was going to materialize regardless. It feeds the
            # verify-kernel gate AND the join-strategy gates below.
            prof_d = rep_docs.count()
    else:
        # direct pipeline: repartition for shingle/signature CPU
        # parallelism (byte-based input splits would underparallelize
        # a small file)
        base_src = _spread(docs).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__t")
        )
    if verify_kernel == "auto":
        # The Arrow sort+searchsorted verify kernel wins per pair
        # (~15 us vs ~110 us for JVM array_intersect's per-row hash-set
        # build) but pays a flat Python-worker/Arrow round-trip that
        # only amortizes when the candidate set is large. Candidate
        # volume scales with DISTINCT text (the pipeline runs on one
        # representative per distinct text), so the gate reads the
        # distinct count — from the pairs path's duplication profile,
        # or from the cluster path's rep-table count above. Measured
        # crossover sits between d=4,992 (kernel loses ~1.3 s flat,
        # driver bench sf0.1) and d=38,845 (kernel wins, sf1u); at
        # d=377 k (sf10u) it wins 12+ s. Both branches are exact on
        # the distinct hashed-shingle arrays — bit-identical answers
        # (pinned by tests/test_dedup_similarity.py equivalence test).
        use_arrow_verify = prof_d >= _VERIFY_KERNEL_MIN_DISTINCT
    else:
        use_arrow_verify = verify_kernel == "arrow"
    # The hashed-shingle table feeds three consumers (signatures and
    # both verify sides); a lazy localCheckpoint computes the
    # shingling once per invocation instead of three times. See
    # operators/ssjoin.py for the persist-vs-localCheckpoint trade.
    base = base_src.select(
        "id",
        hashed_shingle_set("__t", k).alias("sh_hashes"),
    ).localCheckpoint(eager=False)

    # Signature via the Arrow-batched numpy kernel: the JVM
    # higher-order form is interpreted (lambdas don't participate in
    # whole-stage codegen) and measured ~5x slower at 64 hashes; the
    # surrounding pipeline (shingling, banding, candidate join, verify)
    # stays entirely JVM-side. The packed bucket counts for the verify
    # bound ride the same Arrow pass; the kernel output feeds both the
    # band table and the packed-vector join, so it is checkpointed
    # (id + n + 64-long sig + 16-long packed ≈ 700 B per DISTINCT doc).
    sp = (
        base.select(
            "id",
            F.size("sh_hashes").alias("n"),
            minhash_signature_packed_np(num_hashes)(
                F.col("sh_hashes")
            ).alias("sp"),
        )
        .select("id", "n", F.col("sp.sig").alias("sig"), F.col("sp.packed").alias("packed"))
        .localCheckpoint(eager=False)
    )

    # The band table feeds exactly one consumer (the bucket groupBy
    # below), so it needs no materialization barrier of its own — the
    # expensive inputs behind it (the Arrow minhash kernel) are already
    # checkpointed in ``sp``. The set SIZE rides along so the length
    # filter can run during pair generation, before dropDuplicates
    # ever sees the pruned rows.
    banded = _band_table(sp, bands, rows_per_band, extra=("n",))

    # Candidate generation by BUCKET GROUPING, not a band-table
    # self-join (§2.3/§2.4): group the band table once by
    # (band, band_hash), collect each bucket's (id, n) members sorted
    # by id, and stream every within-bucket pair out of two Generates.
    # The self-join form read the 6 M-row (at sf10u) band table twice
    # and — because the checkpoint's frozen estimate undercuts the
    # 64 MB auto threshold at EVERY scale — static-broadcast one full
    # copy of it (a serial driver-side HashedRelation build that dies
    # first at 100 TB: the interval-overlap estimate-blind class).
    # The grouped form's only exchange carries the same (id, n) rows
    # exactly once, partially collected map-side; pair expansion is
    # streamed (never materialized per bucket beyond the member list,
    # which the join form also buffered per key). array_sort makes
    # the bucket order deterministic and gives id_a < id_b for free.
    #
    # The lossless size filter stays (J(A,B) <= min/max of set sizes —
    # the PPJoin length filter): size-mismatched pairs drop before
    # they cost dedup or verify work. The 5e-5 slack mirrors the
    # round(jaccard, 4) in the final filter (a true J of t - 0.00004
    # still rounds up to t). At sf10u this cuts 14.6 M candidates to
    # 9.4 M with zero extra work.
    # The aggregate's own exchange is left to AQE: at sf10u its ~28
    # B/row input coalesces to a handful of tasks and pair generation
    # still measured no slower than a pinned-width variant (a
    # repartition(n_parts, band, band_hash) before the groupBy was
    # tried and REVERTED — no gain at sf10u, +14% on the sf0.1 bench
    # row from three extra tiny-task stages), while at 100 TB the band
    # table's bytes alone keep the stage wide.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list(F.struct("id", "n"))).alias("__ms"))
        .filter(F.size("__ms") >= 2)
        .select("__ms")
    )
    cands = (
        buckets.select(
            "__ms", F.posexplode("__ms").alias("__i0", "__a")
        )
        .filter(F.col("__i0") < F.size("__ms") - 1)
        .select(
            F.col("__a.id").alias("id_a"),
            F.col("__a.n").alias("n_a"),
            F.explode(
                F.slice(
                    "__ms",
                    F.col("__i0") + F.lit(2),
                    F.size("__ms") - F.col("__i0") - F.lit(1),
                )
            ).alias("__b"),
        )
        .select(
            "id_a",
            F.col("__b.id").alias("id_b"),
            "n_a",
            F.col("__b.n").alias("n_b"),
        )
        .filter(
            F.least("n_a", "n_b").cast("double")
            >= (jaccard_threshold - 5e-5) * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .repartition(n_parts, "id_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    # ONE exchange serves both the pair-dedup and the verify layout:
    # the explicit repartition runs FIRST, and dropDuplicates' own
    # ClusteredDistribution on (id_a, id_b) is satisfied by hash
    # partitioning on the subset id_a — equal pairs always share
    # id_a — so the aggregate adds no second shuffle. The explicit
    # count also matters for the verify stage: candidate rows are tiny
    # in BYTES but each costs an exact intersect in CPU, so AQE's
    # byte-based coalescing would squeeze them into a few tasks and
    # run verification nearly single-threaded; a user-specified
    # repartition is exempt from coalescing.

    # sound intersection upper bound BEFORE any array payload moves:
    # join the 128-byte packed bucket-count vectors (never the 5 KB
    # hash arrays) and drop every pair whose bound proves J below the
    # threshold (see _packed_intersect_ub; NULL packed = uncappable
    # doc, must verify). The candidate J distribution is bimodal at
    # sf10u — 9.4 M pairs at J <= 0.4 vs 15 k true pairs at J >= 0.8 —
    # so at the 0.7 pair-form threshold the bound clears ~99.8% of the
    # exact-intersect work (verify stage 25.6 s -> 3.5 s). The bound
    # carries ~0.1-0.15 of additive J slack (per-bucket min picks up
    # E[min(Poisson, Poisson)] noise from non-shared elements), so at
    # LOW thresholds it can prove almost nothing and the two 9 M-row
    # joins are pure overhead — gated off below 0.5 (the clusters
    # query verifies at 0.2, where ~60% of candidates genuinely pass
    # and must be exactly intersected anyway). Join strategy gated on
    # the MEASURED distinct count (_sized): the packed table scales
    # with distinct text and descends from a checkpoint whose
    # frozen-tiny size estimate would otherwise force a static
    # broadcast at every scale (the operators/winnow.py sf10u
    # maxResultSize trap) — broadcast is chosen only where the
    # measured count proves it fits.
    if jaccard_threshold >= 0.5:
        pk = sp.select("id", "packed")
        cands = (
            cands.join(
                _sized(
                    pk.select(
                        F.col("id").alias("id_a"), F.col("packed").alias("pk_a")
                    ),
                    prof_d,
                    _BROADCAST_MAX_ROWS_PACKED,
                ),
                "id_a",
            )
            .join(
                _sized(
                    pk.select(
                        F.col("id").alias("id_b"), F.col("packed").alias("pk_b")
                    ),
                    prof_d,
                    _BROADCAST_MAX_ROWS_PACKED,
                ),
                "id_b",
            )
        )
        ub = _packed_intersect_ub(F.col("pk_a"), F.col("pk_b"))
        cands = cands.filter(
            F.col("pk_a").isNull()
            | F.col("pk_b").isNull()
            | (
                ub.cast("double")
                >= (jaccard_threshold - 5e-5)
                * (F.col("n_a") + F.col("n_b") - ub)
            )
        ).select("id_a", "id_b", "n_a", "n_b")
    # Array-attach joins, strategy gated on the measured distinct
    # count: below the budget the (provably small) array table is
    # explicitly broadcast — the same plan the static planner picked,
    # now justified by a measurement instead of a frozen checkpoint
    # estimate. Above it, shuffle_hash: the array side is hashed per
    # partition (d * ~1.3 KB / parts, a few MB) and the pair side
    # streams WITHOUT the sort a merge join would impose on millions
    # of array-carrying rows. At sf10u the static plan used to build
    # TWO ~450 MB broadcasts of this table (driver-serial, and the
    # first thing to die at 100 TB).
    ha = _sized(
        base.select(F.col("id").alias("id_a"), F.col("sh_hashes").alias("h_a")),
        prof_d,
        _BROADCAST_MAX_ROWS_ARRAY,
        big="shuffle_hash",
    )
    hb = _sized(
        base.select(F.col("id").alias("id_b"), F.col("sh_hashes").alias("h_b")),
        prof_d,
        _BROADCAST_MAX_ROWS_ARRAY,
        big="shuffle_hash",
    )
    # local sort of the SKINNY pair table (24 B rows, no exchange)
    # before the arrays attach: dropDuplicates' hash aggregate emits
    # id_a in hash-table order, so without this the verify kernel's
    # one-element sort cache almost never hits; sorted runs make each
    # left array sort once per ~#partners pairs (the same arrangement
    # operators/ssjoin.py feeds the shared kernel)
    verified = (
        cands.sortWithinPartitions("id_a").join(ha, "id_a").join(hb, "id_b")
    )
    # Exact |A ∩ B| via the sort+searchsorted Arrow kernel (see
    # _intersect_counts_np — ~7x faster per pair than JVM
    # array_intersect's per-row hash-set build, and at low thresholds
    # the verify stage is answer-bound: most candidates are TRUE pairs
    # that must be exactly intersected no matter what). n_a/n_b are
    # exact set sizes (sh_hashes is distinct by construction), so the
    # union size is set arithmetic (|A ∪ B| = |A| + |B| − |A ∩ B|) —
    # never an array_union per pair; the division and round stay
    # JVM-side so float semantics are unchanged.
    if use_arrow_verify:
        counted = verified.select(
            "id_a", "id_b", "n_a", "n_b", "h_a", "h_b"
        ).mapInPandas(
            _intersect_counts_np,
            StructType(
                [
                    verified.schema["id_a"],
                    verified.schema["id_b"],
                    verified.schema["n_a"],
                    verified.schema["n_b"],
                    StructField("inter", IntegerType()),
                ]
            ),
        )
    else:
        # small-candidate branch: stay JVM-side and skip the Python
        # worker round-trip entirely. Both arrays are distinct, so
        # size(array_intersect) IS |A ∩ B| — the same integer the
        # kernel emits (coalesce matches its 0 for a null/empty side).
        counted = verified.select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            F.coalesce(
                F.size(F.array_intersect("h_a", "h_b")), F.lit(0)
            ).alias("inter"),
        )
    inter = F.col("inter")
    jaccard = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    rep_pairs = (
        counted.withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if output == "clusters":
        # sizes is a d-row aggregate over a checkpoint scan — gate its
        # join the same way as every other frozen-estimate side (the
        # planner would otherwise static-broadcast it at any scale)
        sizes = members.groupBy("__th").agg(F.count("*").alias("m"))
        rep_sz = reps.select(F.col("id").alias("rid"), "__th").join(
            _sized(sizes, prof_d, _BROADCAST_MAX_ROWS_META), "__th"
        )
        # join strategy gated on the measured distinct count (_sized):
        # rep_sz scales with distinct content and its lineage passes
        # through an aggregate whose frozen-tiny size estimate would
        # otherwise force a static broadcast at any scale (the
        # operators/winnow.py sf10u maxResultSize trap); below the
        # metadata byte budget the broadcast is measured-safe and
        # skips two shuffles of the verified-pair table
        cross_cl = (
            rep_pairs.join(
                _sized(
                    rep_sz.select(
                        F.col("rid").alias("id_a"), F.col("m").alias("members_a")
                    ),
                    prof_d,
                    _BROADCAST_MAX_ROWS_META,
                ),
                "id_a",
            )
            .join(
                _sized(
                    rep_sz.select(
                        F.col("rid").alias("id_b"), F.col("m").alias("members_b")
                    ),
                    prof_d,
                    _BROADCAST_MAX_ROWS_META,
                ),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                "jaccard",
                "members_a",
                "members_b",
                (F.col("members_a") * F.col("members_b"))
                .cast("bigint")
                .alias("n_member_pairs"),
            )
        )
        # exact-dup clusters as self-rows — only shingleable texts,
        # matching the pair form's exclusion of empty-shingle twins
        intra_cl = (
            rep_sz.join(
                _sized(
                    base.filter(F.size("sh_hashes") > 0).select("id"),
                    prof_d,
                    _BROADCAST_MAX_ROWS_META,
                ),
                F.col("rid") == F.col("id"),
                "left_semi",
            )
            .filter(F.col("m") >= 2)
            .select(
                F.col("rid").alias("id_a"),
                F.col("rid").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
                F.col("m").alias("members_a"),
                F.col("m").alias("members_b"),
                (F.col("m") * (F.col("m") - 1) / 2)
                .cast("bigint")
                .alias("n_member_pairs"),
            )
        )
        return cross_cl.unionByName(intra_cl)
    if not collapse:
        return rep_pairs

    # Expand representative pairs back to member pairs. Clusters are
    # disjoint (one content hash each), so least/greatest restores the
    # id_a < id_b invariant and no cross pair can collide with an
    # intra pair. The expansion is output-cardinality-bound — exactly
    # the rows the uncollapsed pipeline would have verified one by one.
    # strategy gates: rep_th is d rows, members n rows — both descend
    # from checkpoints whose frozen estimates would static-broadcast
    # them at any scale; broadcast only where the measured count fits
    # the metadata byte budget
    rep_th = reps.select(F.col("id").alias("rid"), "__th")
    cross = (
        rep_pairs.join(
            _sized(
                rep_th.select(
                    F.col("rid").alias("id_a"), F.col("__th").alias("__th_a")
                ),
                prof_d,
                _BROADCAST_MAX_ROWS_META,
            ),
            "id_a",
        )
        .join(
            _sized(
                rep_th.select(
                    F.col("rid").alias("id_b"), F.col("__th").alias("__th_b")
                ),
                prof_d,
                _BROADCAST_MAX_ROWS_META,
            ),
            "id_b",
        )
        .join(
            _sized(
                members.select(
                    F.col("__th").alias("__th_a"), F.col("id").alias("a_id")
                ),
                prof_n,
                _BROADCAST_MAX_ROWS_META,
            ),
            "__th_a",
        )
        .join(
            _sized(
                members.select(
                    F.col("__th").alias("__th_b"), F.col("id").alias("b_id")
                ),
                prof_n,
                _BROADCAST_MAX_ROWS_META,
            ),
            "__th_b",
        )
        .select(
            F.least("a_id", "b_id").alias("id_a"),
            F.greatest("a_id", "b_id").alias("id_b"),
            "jaccard",
        )
    )
    if jaccard_threshold > 1.0:
        return cross
    # intra-cluster pairs: identical non-empty shingle sets — Jaccard
    # exactly 1.0 with no verify work (empty-shingle twins excluded:
    # their Jaccard is null in the uncollapsed pipeline)
    shingleable_th = (
        base.filter(F.size("sh_hashes") > 0)
        .select("id")
        .join(
            _sized(rep_th, prof_d, _BROADCAST_MAX_ROWS_META),
            F.col("id") == F.col("rid"),
            "inner",
        )
        .select("__th")
    )
    mm = members.join(
        _sized(shingleable_th, prof_d, _BROADCAST_MAX_ROWS_META),
        "__th",
        "left_semi",
    )
    intra = (
        mm.alias("x")
        .join(
            mm.alias("y"),
            (F.col("x.__th") == F.col("y.__th"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH index (build once, probe per ingest batch)


def _minhash_base(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    bands: int,
):
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("id"),
        hashed_shingle_set(text_col, k).alias("sh_hashes"),
    )
    sigs = base.select(
        "id", minhash_signature_np(num_hashes)(F.col("sh_hashes")).alias("sig")
    )
    return base, _band_table(sigs, bands, rows_per_band)


# Persisted-index format version. The band-hash layout is part of the
# on-disk contract: build and probe MUST compute band_hash the same
# way or every probe silently returns zero band matches. History:
#   1 — band_hash = xxhash64 of a comma-joined STRING of the band's
#       signature values (retired; no live writer since the native
#       multi-arg rewrite)
#   2 — band_hash = multi-argument seed-chained xxhash64 over the
#       band's signature values as native longs (_band_table)
_MINHASH_INDEX_FORMAT = 2


def _index_meta_path(path: str) -> str:
    local = path[len("file://"):] if path.startswith("file://") else path
    return os.path.join(local, "_meta.json")


def _index_params(
    k: int, num_hashes: int, bands: int, n_buckets: int
) -> dict:
    return {
        "format_version": _MINHASH_INDEX_FORMAT,
        "k": k,
        "num_hashes": num_hashes,
        "bands": bands,
        "n_buckets": n_buckets,
    }


def _check_index_meta(path: str, op: str, expected: dict) -> None:
    """Fail fast when a persisted index does not match the reader's
    shingle/band/hash parameters or band-hash format. Without this, a
    parameter or format drift does not error — band hashes simply
    never collide and the probe returns ZERO matches, which an
    admission loop would read as "no duplicates, admit everything".
    An index with data but no ``_meta.json`` predates the metadata
    contract (i.e. an unknown band-hash format) and is rejected for
    the same reason."""
    meta_path = _index_meta_path(path)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{op}: no _meta.json under {path!r} — this index predates "
            "the metadata contract, so its band-hash format is unknown "
            "and probing it would silently return zero matches. Rebuild "
            "it with minhash_index_write(mode='overwrite')."
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    mismatched = {
        key: (meta.get(key), val)
        for key, val in expected.items()
        if meta.get(key) != val
    }
    if mismatched:
        detail = ", ".join(
            f"{key}: index has {have!r}, caller passed {want!r}"
            for key, (have, want) in sorted(mismatched.items())
        )
        raise ValueError(
            f"{op}: parameter/format mismatch against the persisted "
            f"index at {path!r} ({detail}). Probing or appending with "
            "mismatched parameters silently yields zero band matches "
            "or a mixed-format index; rebuild with "
            "minhash_index_write(mode='overwrite') or pass the index's "
            "own parameters."
        )


def minhash_index_write(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist a probeable MinHash-LSH index of ``docs`` under ``path``:

    - ``bands/`` — (th, band, band_hash) partitioned by
      ``bucket = pmod(band_hash, n_buckets)``, so a probe batch that
      touches few hash buckets prunes to those partition directories
      (static partition pruning — the incremental-ingest win);
    - ``hashes/`` — (th, sh_hashes) for the exact-Jaccard verify;
    - ``members/`` — (id, th) mapping every ingested doc id to its
      content hash.

    The signature tables are keyed by ``th = md5(text)`` — ONE row per
    DISTINCT text, however many exact copies the corpus carries. This
    is the index-shaped form of the exact-dup collapse (R107): without
    it, m copies of a text put m identical band rows in every bucket
    and a probe against them verifies m × (batch copies) identical
    candidate pairs — measured 23x time for 10x data on the sf10
    replication fixture (64 s -> 1472 s). With it, candidates and
    verify work are distinct-text-bounded and member pairs are
    restored by output-bound joins through ``members/``.

    Why an index at all: re-running all-pairs dedup over a 100 TB
    corpus for every ingest batch is O(corpus²); probing a persisted
    index is O(batch × matched buckets) + a candidate-bounded verify.
    ``mode="append"`` adds a batch to the index after it has been
    probed/admitted (the incremental ingest loop); an appended text
    that already exists in the index just adds members rows plus one
    redundant signature row, which the probe deduplicates
    candidate-bounded.

    The index carries a ``_meta.json`` recording (format_version, k,
    num_hashes, bands, n_buckets); append and probe validate it and
    fail fast on mismatch (see _check_index_meta). Appending to an
    EMPTY path is index creation and writes the meta; appending to a
    populated pre-meta index is rejected.
    """
    params = _index_params(k, num_hashes, bands, n_buckets)
    local_root = _index_meta_path(path).rsplit(os.sep, 1)[0]
    if mode == "append" and os.path.isdir(os.path.join(local_root, "bands")):
        # appending to an existing index: validate BEFORE writing a
        # single row, so a mismatch can never mix two band-hash
        # formats (or two shingle grains) in one index
        _check_index_meta(path, "minhash_index_write(mode='append')", params)
    members = docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col).cast("string")).alias("th"),
    )
    reps = (
        docs.select(F.md5(F.col(text_col).cast("string")).alias("th"), text_col)
        .dropDuplicates(["th"])
    )
    base, banded = _minhash_base(reps, text_col, "th", k, num_hashes, bands)
    (
        banded.select(F.col("id").alias("th"), "band", "band_hash")
        .withColumn("bucket", F.pmod("band_hash", F.lit(n_buckets)))
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/bands")
    )
    base.select(F.col("id").alias("th"), "sh_hashes").write.mode(mode).parquet(
        f"{path}/hashes"
    )
    members.write.mode(mode).parquet(f"{path}/members")
    # meta commits last: a crashed overwrite leaves no (or a stale)
    # meta for partially-written tables, and the reader's check
    # rejects rather than silently probing a half-built index. Local
    # json like sources/snapshots.py manifests; an object-store
    # deployment would route this through the Hadoop FileSystem API
    # (sources/lake.py note).
    with open(_index_meta_path(path), "w") as fh:
        json.dump(params, fh)


def minhash_index_probe(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    n_buckets: int = 64,
    jaccard_threshold: float = 0.7,
    include_self: bool = False,
) -> DataFrame:
    """Find near-duplicates of ``new_docs`` against a persisted index
    (same shingle/band parameters as the build — enforced against the
    index's ``_meta.json``, which fails fast instead of silently
    matching nothing). Returns (new_id, corpus_id, jaccard).

    ``include_self=True`` keeps pairs where the SAME id sits on both
    sides. For a plain forensic probe those pairs are noise, but for
    an at-least-once admission loop they are the replay signal: a
    re-delivered batch matches its own already-indexed rows id-for-id
    at jaccard 1.0, and dropping those pairs would re-admit the whole
    replay (streaming/ingest.py passes True for exactly this).

    Scale shape: the new batch collapses to ONE representative per
    distinct text (the index stores the corpus the same way, see
    minhash_index_write), the rep band table is tiny and BROADCAST,
    and the corpus band scan is filtered to the batch's buckets first
    (collected from the batch — at most ``n_buckets`` values, driver-
    bounded), so the scan prunes to matching partition directories and
    the candidate join is map-side with no corpus shuffle. The exact
    verify runs once per DISTINCT-TEXT pair; member (new_id,
    corpus_id) pairs are restored by broadcasting the verified th
    pairs over a map-side scan of ``members/`` — no corpus shuffle
    anywhere, and the expansion cost is the output cardinality."""
    _check_index_meta(
        path,
        "minhash_index_probe",
        _index_params(k, num_hashes, bands, n_buckets),
    )
    spark = new_docs.sparkSession
    new_members = new_docs.select(
        F.col(id_col).alias("new_id"),
        F.md5(F.col(text_col).cast("string")).alias("th_n"),
    )
    new_reps = (
        new_docs.select(
            F.md5(F.col(text_col).cast("string")).alias("th"), text_col
        )
        .dropDuplicates(["th"])
    )
    new_base, new_banded = _minhash_base(
        new_reps, text_col, "th", k, num_hashes, bands
    )
    # the batch-side shingle+signature pipeline (the probe's dominant
    # Python-UDF cost) is referenced three times below — the bucket
    # collect, the candidate broadcast, and the verify join — so cache
    # it once; the batch is small by definition of incremental ingest
    new_base = new_base.cache()
    new_banded = new_banded.withColumn(
        "bucket", F.pmod("band_hash", F.lit(n_buckets))
    ).cache()
    probe_buckets = [
        r.bucket for r in new_banded.select("bucket").distinct().collect()
    ]

    corpus_bands = spark.read.parquet(f"{path}/bands").filter(
        F.col("bucket").isin(probe_buckets)
    )
    cands = (
        corpus_bands.join(
            F.broadcast(
                new_banded.select(
                    F.col("id").alias("th_n"), "band", "band_hash"
                )
            ),
            ["band", "band_hash"],
        )
        .select(F.col("th").alias("th_c"), "th_n")
        .dropDuplicates(["th_c", "th_n"])
        # consumed twice (hash semi-prune + verify join): cache the
        # candidate-bounded pair set rather than re-scan the bands
        .cache()
    )
    # same per-doc set-size precompute as minhash_lsh_pairs: one
    # array_intersect per DISTINCT-TEXT candidate pair, union size by
    # set arithmetic. An appended re-ingest can leave a duplicate th
    # row in hashes/; dedupe AFTER the candidate semi-prune so the
    # shuffle is candidate-bounded, never corpus-bounded.
    corpus_hashes = (
        spark.read.parquet(f"{path}/hashes")
        .join(F.broadcast(cands.select("th_c").distinct()),
              F.col("th") == F.col("th_c"), "left_semi")
        .dropDuplicates(["th"])
        .select(
            F.col("th").alias("th_c"),
            F.col("sh_hashes").alias("h_c"),
            F.size(F.array_distinct("sh_hashes")).alias("n_c"),
        )
    )
    new_hashes = new_base.select(
        F.col("id").alias("th_n"),
        F.col("sh_hashes").alias("h_n"),
        F.size(F.array_distinct("sh_hashes")).alias("n_n"),
    )
    inter = F.size(F.array_intersect("h_c", "h_n"))
    jaccard = inter.cast("double") / (F.col("n_c") + F.col("n_n") - inter)
    verified = (
        cands.join(corpus_hashes, "th_c")
        .join(F.broadcast(new_hashes), "th_n")
        .withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("th_c", "th_n", "jaccard")
        # consumed twice (members semi-prune + expansion join)
        .cache()
    )
    # expand distinct-text pairs to member pairs: verified pairs are
    # batch-bounded — broadcast them over a map-side members/ scan
    # (dedup guards a double-appended id), then attach batch members
    members = (
        spark.read.parquet(f"{path}/members")
        .join(F.broadcast(verified.select("th_c").distinct()),
              F.col("th") == F.col("th_c"), "left_semi")
        .dropDuplicates(["id", "th"])
        .select(F.col("id").alias("corpus_id"), F.col("th").alias("th_c"))
    )
    expanded = members.join(F.broadcast(verified), "th_c").join(
        F.broadcast(new_members), "th_n"
    )
    if not include_self:
        # forensic probes drop the same-id-both-sides pair as noise;
        # admission loops keep it — it IS the replay hit (see above)
        expanded = expanded.filter(F.col("corpus_id") != F.col("new_id"))
    result = (
        expanded.select("new_id", "corpus_id", "jaccard")
        # materialize, then release this probe's caches: in the
        # streaming _admit loop a probe runs every micro-batch, and
        # without the unpersist the cached blocks accumulate for the
        # stream's lifetime (reclaimed only under LRU pressure). The
        # checkpoint blocks themselves are freed by the ContextCleaner
        # when the returned DataFrame is garbage-collected.
        .localCheckpoint(eager=True)
    )
    for c in (new_base, new_banded, cands, verified):
        c.unpersist()
    return result


# ---------------------------------------------------------------------------
# SimHash


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array: per bit position, sign of the
    sum of ±1 votes from each token's xxhash64. Expressed as 64 JVM
    aggregate folds over the token-hash array (no Python).
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _bit_voter(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for bit in range(64):
        votes = F.aggregate(hashes, F.lit(0), _bit_voter(bit))
        # bit weight via JVM shiftleft: a python-side 1 << 63 literal
        # overflows Long.MAX; shiftleft wraps to the sign bit correctly
        bit_cols.append(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                F.lit(0).cast("long")
            )
        )
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return total


def simhash64_np(tokens: Column) -> Column:
    """Arrow-batched numpy SimHash: tokens are hashed JVM-side
    (one transform lambda), the 64 bit-vote folds run as one C-level
    (n_tokens × 64) matrix op per document. Bit-identical to
    :func:`simhash64` (same xxhash64 inputs, same vote rule) at ~6x
    its throughput — the 64 interpreted aggregate folds were the
    measured bottleneck of the simhash pipeline, plus ~18 s of Janino
    codegen per plan-cache miss."""
    from pyspark.sql.types import LongType

    bitw = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << bitw

    @F.pandas_udf(LongType())
    def _votes(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            arr = np.asarray(h, dtype=np.int64).astype(np.uint64)
            ones = ((arr[:, None] >> bitw[None, :]) & np.uint64(1)).sum(axis=0)
            mask = (2 * ones.astype(np.int64) - len(arr)) > 0
            word = int(np.bitwise_or.reduce(weights[mask])) if mask.any() else 0
            out.append(word - (1 << 64) if word >= (1 << 63) else word)
        return pd.Series(out, dtype="int64")

    return _votes(F.transform(tokens, lambda t: F.xxhash64(t)))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash with chunk-collision blocking:
    split the 64-bit simhash into 4 × 16-bit chunks; by pigeonhole, any
    pair within hamming distance 3 collides on at least one chunk.
    Self-join per chunk, verify exact hamming distance.
    """
    sims = _spread(docs).select(
        F.col(id_col).alias("id"),
        simhash64_np(F.split(F.trim(F.col(text_col)), r"\s+")).alias("simhash"),
    )
    chunks = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk", "c.chunk_val")

    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for modest candidate sets or as LSH verifier)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Word n-gram Jaccard similarity via an inverted index: explode
    n-grams, self-join on the gram (candidates share >=1 gram), then
    Jaccard = shared / (|A| + |B| - shared).

    No all-pairs: the join is gram-partitioned, which is how inverted-
    index similarity joins scale. ``max_doc_frequency`` is the hot-
    posting guard for 100 TB: grams appearing in more than that many
    documents (stopword grams — a skew bomb, since a posting list of
    length p yields p^2 candidate pairs in one join partition) are
    dropped from *candidate generation only*; surviving candidates are
    verified with exact Jaccard over the full gram sets, so reported
    values are unaffected and recall only drops for pairs whose every
    shared gram is hot — pairs whose similarity is carried by
    stopword boilerplate.
    """
    # split↔gram-lambda barrier: an inline split re-evaluates per gram
    # under CollapseProject (plan-lint 'slice(split(' finding)
    words_df = _spread(docs).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__ws"),
    ).localCheckpoint(eager=False)
    ws = F.col("__ws")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        )
    )
    base = words_df.select(
        "id", grams.alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    inv = base.select("id", "n_grams", F.explode("grams").alias("gram"))
    # measured join gate (round-11 estimate-blind-broadcast audit):
    # the inverted-index self-joins and the verify array attaches all
    # descend from the words checkpoint, whose frozen estimate made
    # the planner static-broadcast one full copy of the corpus-scaled
    # gram table at 377 k docs. One cheap count over the checkpoint
    # (materialized by the query anyway) keys the strategy: broadcast
    # while it provably fits, sort-merge beyond.
    n_docs = words_df.count()

    if max_doc_frequency is None:
        # single-shuffle count path: shared-gram counts double as the
        # exact intersection size because every gram survives
        inv = _sized(inv, n_docs, _SSJ_GRAM_BROADCAST_MAX_DOCS)
        l, r = inv.alias("l"), inv.alias("r")
        shared = (
            l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.id") < F.col("r.id")))
            .groupBy(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
                F.col("l.n_grams").alias("na"),
                F.col("r.n_grams").alias("nb"),
            )
            .agg(F.count("*").alias("shared"))
        )
        jaccard = F.col("shared").cast("double") / (
            F.col("na") + F.col("nb") - F.col("shared")
        )
        return (
            shared.withColumn("jaccard", F.round(jaccard, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # hot-posting cap: the hot-gram list is tiny (few grams exceed the
    # cap by definition), so it broadcasts; the anti-join bounds every
    # posting list — and therefore every join partition — at the cap
    hot = (
        inv.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_frequency)
        .select("gram")
    )
    capped = _sized(
        inv.join(F.broadcast(hot), "gram", "left_anti"),
        n_docs,
        _SSJ_GRAM_BROADCAST_MAX_DOCS,
    )
    lc, rc = capped.alias("l"), capped.alias("r")
    cands = (
        lc.join(rc, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verify on the (candidate-bounded) pair set: join the full
    # gram arrays back so values match the uncapped computation
    ga = _sized(
        base.select(F.col("id").alias("id_a"), F.col("grams").alias("g_a")),
        n_docs,
        _BROADCAST_MAX_ROWS_ARRAY,
    )
    gb = _sized(
        base.select(F.col("id").alias("id_b"), F.col("grams").alias("g_b")),
        n_docs,
        _BROADCAST_MAX_ROWS_ARRAY,
    )
    verified = cands.join(ga, "id_a").join(gb, "id_b")
    shared_sz = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    jaccard = shared_sz / (F.size("g_a") + F.size("g_b") - shared_sz)
    return (
        verified.withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Dedup resolution: candidate pairs -> clusters -> canonical survivor


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``pairs``, where ``component``
    is the minimum id reachable through the pair graph — the cluster
    labeling step that turns near-dup PAIRS into dedup GROUPS.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; rounds run until a
    fixed point. Convergence is bounded by the cluster diameter, and
    LSH-derived near-dup clusters are dense (nearly cliques), so 2-3
    rounds are typical; ``max_iterations`` guards pathological chains.

    Scale notes: each round is one join + one hash aggregate, both on
    (id, label) longs — shuffle volume O(edges). The per-round
    ``localCheckpoint`` truncates the otherwise exponentially-growing
    lineage (the standard Spark pattern for iterative algorithms), and
    the convergence check is a 1-row count action. For graphs with
    long chains at extreme scale, the O(log n)-round alternating
    star algorithms are the drop-in upgrade; near-dup graphs don't
    need them.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_labels = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(nbr_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "id")
            .filter(F.col("o.component") != F.col("n.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Attach (component, is_canonical) to every document: documents in
    the same connected component of ``pairs`` share a component label
    (the minimum member id); the minimum-id member is the canonical
    survivor, everything else in the component is a duplicate.
    Singletons (no pair) are their own canonical component."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        docs.join(comp, docs[id_col] == comp.id, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .withColumn("is_canonical", F.col("component") == F.col(id_col))
        .drop("id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (delegates candidate generation to LSH)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    num_planes: int = 16,
    output: str = "pairs",
) -> DataFrame:
    """Near-duplicate vectors: random-hyperplane LSH buckets as
    candidates, exact cosine as verifier. See similarity.lsh_bucket
    for the signature construction.

    Exact-duplicate collapse (adaptive, the embedding twin of the
    text-side R107): identical vectors share a bucket, so m copies of
    one vector inflate the bucket self-join by C(m,2) while data grows
    by m — measured 39x time for 10x data on the sf10 replication
    fixture. When a 1-row duplication profile shows material dup mass,
    the bucket join runs on ONE representative per distinct vector
    (grouped by the vector itself — exact float equality, no hash
    collision risk) and pairs expand back through vector-keyed joins
    whose cost is the output cardinality. Intra-cluster pairs compute
    the SAME cosine_expr(v, v) as the direct path would, so the
    zero-vector NaN edge case filters identically.

    ``output="clusters"`` returns the CLUSTER-level answer (the
    embedding twin of minhash_lsh_pairs' R140 form): one row per
    verified distinct-VECTOR pair — (id_a, id_b, cosine, members_a,
    members_b, n_member_pairs) with cluster-representative ids — plus
    self-rows for exact-dup vector clusters of size >= 2 (id_a ==
    id_b, cosine = cos(v, v), n_member_pairs = C(m, 2); zero-vector
    clusters filter out on the NaN cosine exactly like the pair
    path). Output cardinality is independent of exact-duplicate mass,
    while the pair form's member expansion is quadratic in it by the
    answer's own semantics."""
    from .similarity import cosine_expr, lsh_bucket

    if output not in ("pairs", "clusters"):
        raise ValueError(
            f"output must be 'pairs' or 'clusters', got {output!r}"
        )
    src = _spread(embeddings).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    if output == "clusters":
        # cluster output NEEDS the cluster structure; no profile to run
        collapse = True
    else:
        prof = src.agg(
            F.count("*").alias("n"), F.countDistinct("vec").alias("d")
        ).first()
        collapse = prof.d * 100 <= prof.n * 95
    if collapse:
        reps = src.groupBy("vec").agg(F.min("id").alias("id"))
        base = reps.select("id", "vec").localCheckpoint(eager=False)
    else:
        base = src
    tagged = base.withColumn(
        "bucket", lsh_bucket(F.col("vec"), num_planes=num_planes)
    )
    l, r = tagged.alias("l"), tagged.alias("r")
    # merge hint: `base` is a localCheckpoint over a groupBy(vec), so
    # its LogicalRDD inherits the aggregate's TINY size estimate and
    # the static planner would broadcast the whole distinct-vector
    # table (float arrays included) — accidentally fine when vectors
    # are heavily duplicated, a driver-killing broadcast on a mostly-
    # unique corpus (the operators/winnow.py sf10u trap; AQE cannot
    # demote a statically-planned broadcast). Sort-merge is size-safe
    # at any distinct-vector cardinality.
    rep_pairs = (
        l.join(
            r.hint("merge"),
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine_expr(F.col("l.vec"), F.col("r.vec")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
    if output == "clusters":
        sizes = src.groupBy("vec").agg(F.count("*").alias("m"))
        rep_sz = base.join(sizes, "vec").select(
            F.col("id").alias("rid"), F.col("m")
        )
        # merge hints: rep_sz scales with distinct content and its
        # lineage passes through an aggregate whose frozen-tiny size
        # estimate would otherwise force a static broadcast (the
        # operators/winnow.py sf10u maxResultSize trap)
        cross_cl = (
            rep_pairs.join(
                rep_sz.select(
                    F.col("rid").alias("id_a"), F.col("m").alias("members_a")
                ).hint("merge"),
                "id_a",
            )
            .join(
                rep_sz.select(
                    F.col("rid").alias("id_b"), F.col("m").alias("members_b")
                ).hint("merge"),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                "cosine",
                "members_a",
                "members_b",
                (F.col("members_a") * F.col("members_b"))
                .cast("bigint")
                .alias("n_member_pairs"),
            )
        )
        self_cl = (
            base.join(sizes, "vec")
            .filter(F.col("m") >= 2)
            .select(
                F.col("id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.round(cosine_expr(F.col("vec"), F.col("vec")), 4).alias(
                    "cosine"
                ),
                F.col("m").alias("members_a"),
                F.col("m").alias("members_b"),
                (F.col("m") * (F.col("m") - 1) / 2)
                .cast("bigint")
                .alias("n_member_pairs"),
            )
            .filter(F.col("cosine") >= cosine_threshold)
        )
        return cross_cl.unionByName(self_cl)
    if not collapse:
        return rep_pairs
    # expand representative pairs to member pairs (disjoint clusters:
    # least/greatest restores id_a < id_b; cross and intra disjoint)
    rep_ids = base.select(F.col("id").alias("rid"), "vec")
    cross = (
        rep_pairs.join(
            rep_ids.select(F.col("rid").alias("id_a"), F.col("vec").alias("__v_a")),
            "id_a",
        )
        .join(
            rep_ids.select(F.col("rid").alias("id_b"), F.col("vec").alias("__v_b")),
            "id_b",
        )
        .join(
            src.select(F.col("vec").alias("__v_a"), F.col("id").alias("a_id")),
            "__v_a",
        )
        .join(
            src.select(F.col("vec").alias("__v_b"), F.col("id").alias("b_id")),
            "__v_b",
        )
        .select(
            F.least("a_id", "b_id").alias("id_a"),
            F.greatest("a_id", "b_id").alias("id_b"),
            "cosine",
        )
    )
    mm = src.alias("x").join(
        src.alias("y"),
        (F.col("x.vec") == F.col("y.vec")) & (F.col("x.id") < F.col("y.id")),
    )
    intra = (
        mm.select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.round(cosine_expr(F.col("x.vec"), F.col("y.vec")), 4).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
    return cross.unionByName(intra)


def embedding_index_probe(
    new_vectors: DataFrame,
    index,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """Incremental embedding near-dup: probe a persisted hyperplane-LSH
    index (similarity.lsh_build — the SAME structure the ANN search
    uses) with an arriving batch and return (new_id, corpus_id,
    cosine) for every near-duplicate against the admitted corpus.

    The minhash twin of this is minhash_index_probe; together they
    close the incremental-ingest story for both text and embedding
    modalities. Scale shape mirrors it: the batch's buckets are
    collected (driver-bounded — at most one per batch row), the
    bucket-partitioned corpus lake prunes to those directories, the
    batch side broadcasts, and exact cosine runs only on bucket-
    collision candidates."""
    from .similarity import cosine_expr, lsh_bucket

    probe = new_vectors.select(
        F.col(index.id_col).alias("new_id"),
        F.col(index.vec_col).alias("new_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("new_vec"), index.num_planes))
    probe = probe.cache()  # bucket collect + candidate join reuse it
    buckets = [r.bucket for r in probe.select("bucket").distinct().collect()]

    corpus = index.table.filter(F.col("bucket").isin(buckets)).select(
        F.col(index.id_col).alias("corpus_id"),
        F.col(index.vec_col).alias("corpus_vec"),
        "bucket",
    )
    cos = F.round(cosine_expr(F.col("corpus_vec"), F.col("new_vec")), 4)
    return (
        corpus.join(F.broadcast(probe), "bucket")
        .filter(F.col("corpus_id") != F.col("new_id"))
        .select("new_id", "corpus_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= cosine_threshold)
        .dropDuplicates(["new_id", "corpus_id"])
    )


def segment_dedup_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
) -> DataFrame:
    """C4-style intra-corpus segment dedup as a TRANSFORM: split every
    document into consecutive ``seg_words``-word segments, keep exactly
    ONE canonical copy (lowest (doc id, position)) of any segment that
    occurs more than once anywhere in the corpus, and reconstruct each
    document's cleaned text from its surviving segments in order —
    the "removed all but one of any three-sentence span occurring more
    than once" cleaning step of C4 (Raffel et al., JMLR 2020 §2.2),
    re-grained to word windows because the synthetic corpus has no
    sentence boundaries.

    Returns (id, clean_text, n_segments, n_dropped). Documents whose
    every segment was dropped come back with clean_text = ''.

    Scale shape (decide with small rows, move big rows once): every
    keep/drop decision depends only on (doc, position, md5(segment)) —
    ~44 bytes per segment — never on the segment text, so the decision
    pipeline runs entirely on that metadata: segments are counted and
    canonicalized by ONE map-side-combinable aggregate keyed on
    md5(segment) — never a rank window partitioned by segment text,
    which would serialize each hot boilerplate segment's millions of
    occurrences through a single reducer at 100 TB — and the keep
    decision joins the (hash, first-occurrence, count) aggregate back
    onto the exploded metadata (AQE picks broadcast vs shuffle by
    measured size). Document TEXT crosses exactly one exchange: the
    per-doc dropped-position lists (ints) are aggregated on metadata
    and joined to the materialized word arrays by doc id, and each
    cleaned text is REBUILT IN PLACE from its own word array by
    slicing the surviving positions — the previous form shuffled the
    full segment text twice (once by segment hash into the decision
    join, once by doc id into a collect_list/array_sort rebuild) to
    move information the 4-byte positions already carry.
    """
    # materialization barrier between the split and the segment
    # lambda: without it CollapseProject inlines split(text) INTO the
    # per-element slice — O(words²/seg_words) re-split per document
    # (the operators/winnow.py trap; verified in the optimized plan).
    # Behind the barrier __ws is a concrete column, so each slice is
    # O(seg_words) over the materialized array. The barrier also feeds
    # the rebuild join below, so the split runs once per doc total.
    # NULL text never segments (posexplode of a null array emits no
    # rows), so the old seg-table-grained pipeline dropped those docs;
    # the doc-grained rebuild must filter them explicitly.
    with_ws = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.split(F.col(text_col), " ").alias("__ws"),
        )
        .filter(F.col("__ws").isNotNull())
        .localCheckpoint(eager=False)
    )
    ws = F.col("__ws")
    n_seg = F.ceil(F.size(ws) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(1), n_seg),
        lambda i: F.array_join(
            F.slice(ws, (i - F.lit(1)) * seg_words + F.lit(1), seg_words), " "
        ),
    )
    # metadata pass: hash each segment where it is born, project the
    # text away before anything crosses a shuffle. seg_meta feeds two
    # consumers (the first-occurrence aggregate and the decision join);
    # without a materialization barrier each consumer re-runs the
    # segment construction — the round-10 after-plan still carried TWO
    # Generate posexplode nodes. The checkpoint stores only
    # (__id, __idx, __h) ≈ 44 B/segment, never text, so the explode +
    # md5 runs once per invocation.
    seg_meta = (
        with_ws.select(
            F.col("__id"), F.posexplode(segs).alias("__pos0", "__seg")
        )
        .select(
            "__id",
            (F.col("__pos0") + 1).alias("__idx"),
            F.md5(F.col("__seg")).alias("__h"),
        )
        .localCheckpoint(eager=False)
    )
    # join-strategy gate from a MEASURED count (the _sized pattern):
    # firsts and drop_lists are aggregates over checkpoint scans, so
    # the static planner broadcasts them off frozen estimates at EVERY
    # scale (round-11 plan audit: both joins were BroadcastHashJoin at
    # sf10u, a ~200 MB build that happens to win there but is
    # scale-blind). seg_meta is checkpointed — its count (total
    # segments, an upper bound for both sides' rows at ~70 B/row) is
    # one cheap job over work the query materializes anyway; 3 M rows
    # ≈ 200 MB matches the measured-good sf10u broadcast, beyond that
    # the joins degrade to sort-merge instead of a driver-side build.
    seg_count = seg_meta.count()
    firsts = seg_meta.groupBy("__h").agg(
        F.count("*").alias("__cnt"),
        F.min(F.struct("__id", "__idx")).alias("__first"),
    )
    # dropped = duplicated segment occurrences that are not the
    # canonical first: exactly the complement of the old kept filter
    drops = seg_meta.join(
        _sized(firsts, seg_count, _SEG_BROADCAST_MAX_ROWS), "__h"
    ).filter(
        (F.col("__cnt") > 1)
        & ~(
            (F.col("__id") == F.col("__first.__id"))
            & (F.col("__idx") == F.col("__first.__idx"))
        )
    )
    drop_lists = drops.groupBy("__id").agg(
        F.collect_list("__idx").alias("__dropped")
    )
    dropped = F.coalesce(F.col("__dropped"), F.array().cast("array<int>"))
    # surviving positions in document order: array_except streams its
    # first argument in order against a hash set of the second, so the
    # rebuild concatenates segments exactly as the array_sort of the
    # old collect_list form did
    kept_idx = F.array_except(F.sequence(F.lit(1), n_seg), dropped)
    return with_ws.join(
        _sized(drop_lists, seg_count, _SEG_BROADCAST_MAX_ROWS),
        "__id",
        "left",
    ).select(
        F.col("__id").alias(id_col),
        F.array_join(
            F.transform(
                kept_idx,
                lambda i: F.array_join(
                    F.slice(ws, (i - F.lit(1)) * seg_words + F.lit(1), seg_words),
                    " ",
                ),
            ),
            " ",
        ).alias("clean_text"),
        n_seg.cast("bigint").alias("n_segments"),
        F.size(dropped).cast("bigint").alias("n_dropped"),
    )
