

def test_write_corpus_partitioned_and_size_capped(spark, tmp_path):
    """Partitioned corpus write: directory partitions per (lang), file row
    cap honored, read-back pruned scan returns exactly the partition, and
    the full read-back row set matches the input."""
    import os

    from kafka_flink_processing_spark.sources.formats import write_corpus
    from kafka_flink_processing_spark.sources.parquet import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001") \
        .select("doc_id", "lang", "source", "text")
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, partition_cols=("lang",),
                 target_rows_per_file=50)

    langs = {d.split("=", 1)[1] for d in os.listdir(out)
             if d.startswith("lang=")}
    assert langs == {r.lang for r in docs.select("lang").distinct().collect()}

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # per-file row cap honored (parquet row count per file <= 50)
    import glob
    for f in glob.glob(f"{out}/lang=*/*.parquet"):
        import pyarrow.parquet as pq
        assert pq.ParquetFile(f).metadata.num_rows <= 50

    # partition pruning: a lang filter must reach the scan as a
    # PartitionFilters entry, not a post-scan filter
    plan = (back.filter(back.lang == "en")._jdf.queryExecution()
            .executedPlan().toString())
    assert "PartitionFilters: [isnotnull(lang" in plan
