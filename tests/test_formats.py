

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


def test_scratch_root_owned_and_private():
    # r5 advice hardening: the shared scratch root must be a non-symlink
    # directory owned by us with mode 0700 (hostile-/tmp posture); the
    # helper falls back to mkdtemp when that can't be guaranteed
    import os
    import stat

    from kafka_flink_processing_spark.sources.formats import (
        roundtrip_scratch_dir,
    )
    d = roundtrip_scratch_dir("permcheck")
    root = os.path.dirname(d)
    st = os.lstat(root)
    assert stat.S_ISDIR(st.st_mode)
    if hasattr(os, "getuid"):
        assert st.st_uid == os.getuid()
    assert stat.S_IMODE(st.st_mode) == 0o700


def test_drain_streaming_multi_cleans_scratch_on_failure(spark):
    # r5 advice: a failing build must not leak the staged copy/checkpoint
    import glob
    import tempfile

    from kafka_flink_processing_spark.streaming.sinks import (
        drain_streaming_multi,
    )
    before = set(glob.glob(f"{tempfile.gettempdir()}/kfps_failtag_*"))
    df = spark.range(3).selectExpr("id", "timestamp'2024-01-01' as ts")

    def bad_build(streams):
        raise RuntimeError("synthetic build failure")

    try:
        drain_streaming_multi({"only": df}, bad_build, "failtag")
    except RuntimeError:
        pass
    else:
        raise AssertionError("expected the synthetic failure to propagate")
    after = set(glob.glob(f"{tempfile.gettempdir()}/kfps_failtag_*"))
    assert after == before, f"leaked scratch dirs: {after - before}"
