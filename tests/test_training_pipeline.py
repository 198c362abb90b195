"""End-to-end training-data assembly: dedup → quality gate → split →
pack → partitioned shard write, composed from the individual operators
the queries expose — proving the pipeline stages agree with each other
(same keep-sets, leak-free splits, contiguous packs) when chained, not
just in isolation."""

from __future__ import annotations

from conftest import SF_SMOKE


def test_corpus_to_shards_end_to_end(spark, tmp_path):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stock_prediction_data_engineering_spark.operators.dedup import (
        minhash_lsh_pairs,
        resolve_duplicates,
    )
    from stock_prediction_data_engineering_spark.queries.llm_pipeline import (
        pack_assignment,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_raw = docs.count()

    # 1) near-dup resolution: keep canonical survivors only
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.7)
    resolved = resolve_duplicates(docs, pairs)
    kept = resolved.filter("is_canonical").select("doc_id", "text", "source")
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 2) quality gate: top half by TTR within each source
    m = kept.select(
        "doc_id",
        "text",
        "source",
        F.floor(
            F.size(F.array_distinct(F.split("text", " "))).cast("double")
            / F.size(F.split("text", " "))
            * 10000
        ).cast("bigint").alias("ttr_bp"),
    )
    w_rank = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("ttr_bp").desc(), "doc_id")
    )
    w_n = F.count("*").over(Window.partitionBy("source"))
    gated = (
        m.withColumn("rn", w_rank)
        .withColumn("n", w_n)
        .filter(F.col("rn") * 2 <= F.col("n"))
        .drop("rn", "n", "ttr_bp")
    )
    n_gated = gated.count()
    # per-source halves sum to roughly half the corpus
    assert 0 < n_gated <= n_kept // 2 + gated.select("source").distinct().count()

    # 3) content-hash split: dedup already removed exact dups, and the
    # hash is of content, so no text can appear in two splits
    bucket = F.substring(F.md5("text"), 1, 2)
    split = (
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test")
    )
    labeled = gated.withColumn("split", split).withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    leak = (
        labeled.groupBy(F.md5("text").alias("h"))
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert leak == 0
    assert set(
        r.split for r in labeled.select("split").distinct().collect()
    ) <= {"train", "val", "test"}

    # 4) pack the train split per source and write shards by split
    train = labeled.filter("split = 'train'")
    packed = pack_assignment(train, "source", "doc_id", "n_tokens", 512)
    # offsets bounded; packs within a source cover 0..max contiguously
    bad_off = packed.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512)
    ).count()
    assert bad_off == 0
    per_src = (
        packed.groupBy("source")
        .agg(
            F.max("pack_id").alias("max_pack"),
            F.count_distinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("tok"),
        )
        .collect()
    )
    for r in per_src:
        # concat-and-chunk: pack ids are exactly 0..max_pack with no gaps
        assert r.n_packs == r.max_pack + 1
        # and the last-started pack index matches the token total
        assert r.max_pack <= r.tok // 512

    out = str(tmp_path / "shards")
    labeled.drop("text").write.partitionBy("split").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == labeled.count()
    # partition pruning works on the split column
    assert (
        back.filter("split = 'train'").count()
        == train.count()
    )
