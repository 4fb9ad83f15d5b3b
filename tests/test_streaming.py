"""Structured Streaming tests: file-sink ingest, session windows, dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_ingestion_spark.streaming.pipeline import (
    read_stream_table,
    run_stream_to_memory,
    sessionized,
    stream_ingest_partitioned,
    tumbling_counts,
)


def test_stream_ingest_partitioned_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed file-sink ingest; re-running with the same checkpoint
    must not duplicate data (the streaming replacement for sync.json)."""
    out = str(tmp_path / "lake" / "events")
    ckpt = str(tmp_path / "ckpt" / "events")

    stream = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_ingest_partitioned(stream, out, ckpt, partition_columns=["YEAR"])

    n_static = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    first = spark.read.parquet(out).count()
    assert first == n_static
    assert os.path.isdir(os.path.join(out, "YEAR=2024"))

    # second increment: no new source files → no new rows (offsets in checkpoint)
    stream2 = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_ingest_partitioned(stream2, out, ckpt, partition_columns=["YEAR"])
    assert spark.read.parquet(out).count() == n_static


def test_streaming_session_windows_match_batch(spark, sf_dir):
    """Session windows computed over a stream equal the batch computation."""
    stream = read_stream_table(spark, sf_dir, "events")
    streamed = run_stream_to_memory(sessionized(stream), output_mode="complete")

    from pyspark_ingestion_spark.sources.readers import load_table

    batch = sessionized(load_table(spark, sf_dir, "events"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty() and batch.exceptAll(streamed).isEmpty()


def test_streaming_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark removes re-deliveries of the same event id."""
    # duplicate the source: two copies of every event
    dup_dir = str(tmp_path / "dups")
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events").limit(200)
    e.unionAll(e).coalesce(1).write.parquet(dup_dir)

    schema = spark.read.parquet(dup_dir).schema
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    result = run_stream_to_memory(deduped, output_mode="append")
    assert result.count() == 200
    assert result.groupBy("event_id").count().filter("count > 1").isEmpty()


def test_tumbling_counts_total_preserved(spark, sf_dir):
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    agg = tumbling_counts(e, "1 hour")
    assert agg.agg(F.sum("n")).first()[0] == e.count()


def test_foreach_batch_overwrite_sink(spark, sf_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: replaying the stream
    with a FRESH checkpoint (simulated replay) rewrites partitions
    instead of duplicating rows."""
    out = str(tmp_path / "fb_lake")
    stream = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    from pyspark_ingestion_spark.streaming.pipeline import stream_foreach_batch_overwrite

    stream_foreach_batch_overwrite(stream, out, str(tmp_path / "ck1"), ["YEAR"])
    n = spark.read.parquet(out).count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # replay everything (new checkpoint → batch re-delivered) — overwrite
    # keeps the sink idempotent where plain append would double it
    stream2 = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_foreach_batch_overwrite(stream2, out, str(tmp_path / "ck2"), ["YEAR"])
    assert spark.read.parquet(out).count() == n


def test_stream_cdc_upsert_applies_changes(spark, tmp_path):
    """CDC feed applied through real Structured Streaming foreachBatch:
    latest-wins per key + tombstones, same result as the batch merge."""
    from pyspark_ingestion_spark.ingestion.cdc import cdc_upsert
    from pyspark_ingestion_spark.sources.writers import write_partitioned
    from pyspark_ingestion_spark.streaming.pipeline import stream_cdc_upsert

    feed_dir = str(tmp_path / "feed")
    base = spark.createDataFrame(
        [(1, "a-v1", 100, "2019", False), (3, "c-v1", 100, "2020", False)],
        "id long, val string, ver long, YEAR string, deleted boolean",
    )
    lake = str(tmp_path / "lake")
    write_partitioned(base.drop("deleted"), lake, partition_columns=["YEAR"],
                      mode="overwrite", compression="snappy")

    changes = spark.createDataFrame(
        [(1, "a-v2", 200, "2019", False),
         (2, "b-v1", 200, "2019", False),
         (3, None, 200, "2020", True)],
        "id long, val string, ver long, YEAR string, deleted boolean",
    )
    changes.write.parquet(feed_dir)

    stream = spark.readStream.schema(changes.schema).parquet(feed_dir)
    stream_cdc_upsert(
        stream, lake, checkpoint=str(tmp_path / "ckpt"),
        key_cols=["id"], order_cols=["ver"], partition_columns=["YEAR"],
        delete_col="deleted",
    )
    out = {r["id"]: r["val"] for r in spark.read.parquet(lake).collect()}
    assert out == {1: "a-v2", 2: "b-v1"}  # 3 tombstoned

    # equivalent batch merge produces the same lake
    lake2 = str(tmp_path / "lake2")
    write_partitioned(base.drop("deleted"), lake2, partition_columns=["YEAR"],
                      mode="overwrite", compression="snappy")
    cdc_upsert(spark, changes, lake2, key_cols=["id"], order_cols=["ver"],
               partition_columns=["YEAR"], delete_col="deleted")
    out2 = {r["id"]: r["val"] for r in spark.read.parquet(lake2).collect()}
    assert out2 == out


def test_stream_dedup_admission_matches_batch_and_restarts(spark, tmp_path):
    """Streaming LSH admission ≡ the sequential batch-mode loop on the
    same micro-batches (growing corpus: rejects depend on earlier
    batches' admissions), and a checkpoint restart continues the grown
    corpus without reprocessing or duplicating earlier batches."""
    import time

    from pyspark_ingestion_spark.operators.dedup import (
        incremental_lsh_rejects,
        release_shingle_caches,
    )
    from pyspark_ingestion_spark.streaming.pipeline import stream_dedup_admission

    mk = lambda words: " ".join(words)  # noqa: E731
    base_t = mk(["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa", "lamda", "mu"])
    u = mk(["red", "green", "blue", "cyan", "magenta", "yellow",
            "black", "white", "orange", "purple", "brown", "pink"])
    v = mk(["one", "two", "three", "four", "five", "six",
            "seven", "eight", "nine", "ten", "eleven", "twelve"])
    w = mk(["north", "south", "east", "west", "up", "down",
            "left", "right", "front", "back", "over", "under"])
    base_corpus = spark.createDataFrame([(0, base_t)], "doc_id int, text string")
    # fileA: 10 = exact dup of corpus → reject; 11 = unique → admit
    file_a = [(10, base_t), (11, u)]
    # fileB: 12 = near-dup of 11 (admitted in A) → reject iff corpus grows;
    #        13 = unique → admit
    near_u = u.replace("pink", "pinkish")
    file_b = [(12, near_u), (13, v)]
    # fileC (after restart): 14 = dup of 13 → reject; 15 = unique → admit
    file_c = [(14, v), (15, w)]

    src = str(tmp_path / "src")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    kwargs = dict(n=3, num_hashes=8, band_size=2, threshold_num=1,
                  threshold_den=2, max_doc_freq=None)

    def write_file(name, rows):
        spark.createDataFrame(rows, "doc_id int, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / ("stage_" + name)))
        # one data file per micro-batch, atomically placed
        import glob as _glob
        import shutil

        part = _glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id int, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_dedup_admission(stream, base_corpus, out, ckpt, **kwargs)

    write_file("a", file_a)
    write_file("b", file_b)
    run_stream()
    got_ab = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }

    # sequential batch-mode model over the same micro-batches
    def batch_model(batches):
        corpus_rows = [(0, base_t)]
        admitted = set()
        for rows in batches:
            corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")
            batch = spark.createDataFrame(rows, "doc_id int, text string")
            rej = {
                r["doc_id"]
                for r in incremental_lsh_rejects(
                    corpus, batch, "doc_id", "text", **kwargs
                ).collect()
            }
            release_shingle_caches()
            keep = [r for r in rows if r[0] not in rej]
            admitted |= {r[0] for r in keep}
            corpus_rows += keep
        return admitted

    assert got_ab == batch_model([file_a, file_b]) == {11, 13}

    # restart: add fileC, same checkpoint — only C is processed, against
    # the corpus grown by A and B's admissions
    write_file("c", file_c)
    run_stream()
    got_abc = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert got_abc == batch_model([file_a, file_b, file_c]) == {11, 13, 15}
    # no duplicated earlier batches: each admitted doc appears exactly once
    counts = (
        spark.read.parquet(out).groupBy("doc_id").count().collect()
    )
    assert all(r["count"] == 1 for r in counts), counts


def test_transform_with_state_matches_apply_in_pandas(spark, sf_dir):
    """transformWithStateInPandas totals ≡ the applyInPandasWithState
    form on the same static input. SKIPS where the worker runtime can't
    start (no protobuf in this container) — the documented env gate;
    the API-level plan construction is still exercised unconditionally."""
    import pytest

    from pyspark_ingestion_spark.streaming.pipeline import (
        read_stream_table,
        run_stream_to_memory,
    )
    from pyspark_ingestion_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
        tws_runtime_available,
    )

    stream = read_stream_table(spark, sf_dir, "events")
    tws = running_user_totals_tws(stream)  # plan builds even without runtime
    assert tws.isStreaming
    if not tws_runtime_available():
        pytest.skip("transformWithState worker runtime needs protobuf (absent here)")
    got = sorted(
        map(tuple, run_stream_to_memory(tws, output_mode="update").collect())
    )
    want = sorted(
        map(
            tuple,
            run_stream_to_memory(
                running_user_totals(read_stream_table(spark, sf_dir, "events")),
                output_mode="update",
            ).collect(),
        )
    )
    assert got == want


def test_stream_dedup_admission_replay_is_idempotent(spark, tmp_path):
    """The crash-replay window (restart between the sink's parquet write
    and the checkpoint commit): re-running the SAME batch id must
    reproduce the first attempt's partition, not erase it. The first
    attempt's output is on disk when the replay runs — if it counted as
    corpus, the batch's own docs would reject themselves at Jaccard 1
    and the overwrite would drop them permanently."""
    from pyspark_ingestion_spark.streaming.pipeline import _admit_dedup_batch

    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [(10, "one two three four five six seven eight nine ten"),
         (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    out = str(tmp_path / "admitted")
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=None, max_bucket_size=None)
    _admit_dedup_batch(batch, 0, base, out, **kwargs)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [10]  # 11 is an exact dup of the base corpus
    # replay the same batch id — the crash-recovery path
    _admit_dedup_batch(batch, 0, base, out, **kwargs)
    replay = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert replay == first, (first, replay)


def test_foreach_batch_overwrite_guard_survives_restart(spark, sf_dir, tmp_path):
    """The partition-clash guard is durable: a SECOND AvailableNow
    increment (fresh sink invocation, new batch ids) carrying an
    already-owned partition value must fail loudly instead of silently
    erasing the first increment's rows."""
    import pytest

    from pyspark_ingestion_spark.streaming.pipeline import (
        stream_foreach_batch_overwrite,
    )

    src = str(tmp_path / "src")
    path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df1 = spark.createDataFrame([(1, "a", "d1")], "id int, v string, day string")
    df1.coalesce(1).write.parquet(src)
    stream1 = spark.readStream.schema("id int, v string, day string").parquet(src)
    stream_foreach_batch_overwrite(stream1, path, ckpt, ["day"])
    assert {r["id"] for r in spark.read.parquet(path).collect()} == {1}

    # second increment re-carrying day=d1 (plus a new file so a batch fires)
    spark.createDataFrame([(2, "b", "d1")], "id int, v string, day string")\
        .coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("id int, v string, day string").parquet(src)
    with pytest.raises(Exception, match="already written"):
        stream_foreach_batch_overwrite(stream2, path, ckpt, ["day"])
    # the first increment's data survived the rejected overwrite
    assert {r["id"] for r in spark.read.parquet(path).collect()} == {1}


def test_stateful_totals_all_null_values_emit_null(spark, tmp_path):
    """A key whose values are all NULL emits total_value NULL (pandas
    sums all-NaN to 0.0; the batch-groupBy parity contract requires
    NULL)."""
    from pyspark_ingestion_spark.streaming.pipeline import run_stream_to_memory
    from pyspark_ingestion_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, None), (1, None), (2, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_stream_to_memory(
            running_user_totals(stream), output_mode="update"
        ).collect()
    }
    assert got[1] == (2, None), got
    assert got[2] == (1, 5.0), got


def _mk_admission_files(spark, tmp_path, src, files):
    """Stage each (name, rows) as ONE parquet data file in src, with
    distinct mtimes so maxFilesPerTrigger=1 yields deterministic
    micro-batch order."""
    import glob as _glob
    import shutil
    import time

    os.makedirs(src, exist_ok=True)
    for name, rows in files:
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, "doc_id int, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))
        time.sleep(1.1)


@pytest.mark.parametrize("index_mode", ["fingerprint", "hotlog"])
def test_stream_dedup_admission_indexed_matches_recompute(
    spark, tmp_path, index_mode
):
    """The incremental-band-table form — in BOTH maintenance modes:
    fingerprint (per-batch staleness detection) and hotlog (df-delta +
    hot-transition log, zero corpus-wide read-path aggregates; the
    crossing batch re-bands eagerly) — admits EXACTLY the docs the
    recompute form admits on the same micro-batches — including across a
    df-cap transition (a boilerplate shingle crossing max_doc_freq
    mid-stream forces re-banding of already-indexed corpus docs), and
    across a checkpoint restart. Also proves re-banding actually
    happened (the index holds a newer band version for a base doc)."""
    from pyspark_ingestion_spark.operators.dedup import (
        incremental_lsh_rejects,
        release_shingle_caches,
    )
    from pyspark_ingestion_spark.streaming.pipeline import stream_dedup_admission

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    base_rows = [
        (0, boiler + " alpha beta gamma delta epsilon zeta"),
        (1, boiler + " eta theta iota kappa lamda mu"),
    ]
    file_a = [
        (10, boiler + " red green blue cyan magenta yellow"),  # boiler df→3: hot next batch
        (11, "one two three four five six seven eight nine ten eleven twelve"),
    ]
    file_b = [
        # shares ONLY boilerplate with the corpus — after the cap fires,
        # boiler shingles vanish from both sides, so this must ADMIT;
        # without re-banding the stale base-doc bands it would collide
        (12, boiler + " north south east west up down"),
        (13, "unus duo tres quattuor quinque sex septem octo novem decem"),
    ]
    file_c = [
        (14, "unus duo tres quattuor quinque sex septem octo novem decem"),  # dup of 13
        (15, "voro fero gero curo duco dico disco posco pasco nosco"),
    ]
    base_corpus = spark.createDataFrame(base_rows, "doc_id int, text string")
    kwargs = dict(n=3, num_hashes=8, band_size=2, threshold_num=1,
                  threshold_den=2, max_doc_freq=2, max_bucket_size=None)

    src = str(tmp_path / "src")
    _mk_admission_files(spark, tmp_path, src, [("a", file_a), ("b", file_b)])

    def run(out, ckpt, index_path):
        stream = (
            spark.readStream.schema("doc_id int, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_dedup_admission(
            stream, base_corpus, out, ckpt, index_path=index_path,
            index_mode=index_mode, **kwargs
        )

    out_r = str(tmp_path / "out_recompute")
    out_i = str(tmp_path / "out_indexed")
    index = str(tmp_path / "index")
    run(out_r, str(tmp_path / "ckpt_r"), None)
    run(out_i, str(tmp_path / "ckpt_i"), index)

    def admitted_by_batch(path):
        return {
            (r["__batch_id"], r["doc_id"])
            for r in spark.read.parquet(path).select("__batch_id", "doc_id").collect()
        }

    got_r, got_i = admitted_by_batch(out_r), admitted_by_batch(out_i)
    assert got_i == got_r, (sorted(got_i), sorted(got_r))

    # sequential batch-mode model (recompute semantics) agrees too
    model_kwargs = {k: v for k, v in kwargs.items() if k != "max_bucket_size"}
    corpus_rows, admitted = list(base_rows), set()
    for rows in [file_a, file_b]:
        corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")
        batch = spark.createDataFrame(rows, "doc_id int, text string")
        rej = {
            r["doc_id"]
            for r in incremental_lsh_rejects(
                corpus, batch, "doc_id", "text", **model_kwargs
            ).collect()
        }
        release_shingle_caches()
        keep = [r for r in rows if r[0] not in rej]
        admitted |= {r[0] for r in keep}
        corpus_rows += keep
    assert {d for _, d in got_i} == admitted
    assert 12 in admitted  # the cap transition actually mattered

    # re-banding proof: some base/early doc carries band rows in a LATER
    # index partition than its admission partition (shadowing the stale ones)
    bands = spark.read.parquet(f"{index}/bands")
    vers = {
        (r["doc"], int(r["__batch_id"])) for r in bands.select("doc", "__batch_id").collect()
    }
    rebanded = {d for d, v in vers if d in (0, 1, 10) and v > (-1 if d in (0, 1) else 0)}
    assert rebanded, sorted(vers)

    # restart: file C continues the same checkpoint + index
    _mk_admission_files(spark, tmp_path, src, [("c", file_c)])
    run(out_r, str(tmp_path / "ckpt_r"), None)
    run(out_i, str(tmp_path / "ckpt_i"), index)
    got_r3, got_i3 = admitted_by_batch(out_r), admitted_by_batch(out_i)
    assert got_i3 == got_r3
    assert {d for _, d in got_i3} - {d for _, d in got_i} == {15}  # 14 rejected vs 13


@pytest.mark.parametrize("index_mode", ["fingerprint", "hotlog"])
def test_indexed_admission_replay_and_corpus_text_free_plan(
    spark, tmp_path, index_mode
):
    """(1) Replaying a micro-batch through _admit_dedup_batch_indexed
    reproduces (never erases) the first attempt across every index
    table (incl. hotlog's dfcnt/hot log); (2) the per-batch admission
    plan reads ONLY the index and the batch — the corpus text (out_path
    or the base corpus's source) appears nowhere in it. This is the
    100 TB property the indexed form exists for: per-batch work is
    O(batch + index read-back), never O(corpus re-shingle)."""
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        _indexed_rejects,
        _indexed_rejects_hotlog,
    )

    base_path = str(tmp_path / "base_docs")
    spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string",
    ).write.parquet(base_path)
    base = spark.read.parquet(base_path)

    out = str(tmp_path / "admitted")
    index = str(tmp_path / "index")
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=2, max_bucket_size=None)

    b0 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta thetax"),  # near-dup → reject
         (11, "one two three four five six seven eight")],
        "doc_id int, text string",
    )
    _admit_dedup_batch_indexed(b0, 0, base, out, index, index_mode=index_mode,
                               **kwargs)

    tables = ["postings", "bands"] + (
        ["dfcnt", "hot"] if index_mode == "hotlog" else []
    )

    def snap():
        out_rows = {tuple(r) for r in spark.read.parquet(out).collect()}
        idx_rows = []
        for t in tables:
            try:
                idx_rows.append(
                    (t, frozenset(
                        tuple(r) for r in spark.read.parquet(f"{index}/{t}").collect()
                    ))
                )
            except Exception:
                idx_rows.append((t, None))  # empty table with no files yet
        return out_rows, tuple(idx_rows)

    first = snap()
    assert {r[0] for r in first[0]} == {11}
    _admit_dedup_batch_indexed(b0, 0, base, out, index, index_mode=index_mode,
                               **kwargs)  # replay
    assert snap() == first

    # plan property: batch 1's rejects plan scans index + batch only
    b1 = spark.createDataFrame(
        [(12, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
        "doc_id int, text string",
    )
    if index_mode == "hotlog":
        rejects, _sb = _indexed_rejects_hotlog(
            spark, b1.select("doc_id", "text"), index, 1,
            "doc_id", 3, 8, 2, 1, 2, 2, None,
        )
    else:
        rejects, _sb, _stale = _indexed_rejects(
            spark, b1.select("doc_id", "text"), index, 1,
            "doc_id", 3, 8, 2, 1, 2, 2, None,
        )
    # inputFiles = every file any scan in the plan would read
    files = rejects.inputFiles()
    assert files, "expected index scans in the plan"
    assert not any("base_docs" in f for f in files), files
    assert not any("/admitted/" in f for f in files), files  # out_path text never read
    assert any("/postings/" in f for f in files), files
    rejects.collect()  # and it actually runs


def test_hotlog_mode_rejects_fractional_cap(spark, tmp_path):
    """hotlog correctness rests on hot-set monotonicity, which a
    fractional df cap breaks (the threshold count moves with corpus
    size) — the entry points must fail fast, not silently mis-admit."""
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        _validate_index_mode,
    )

    with pytest.raises(ValueError, match="INTEGER max_doc_freq"):
        _validate_index_mode("hotlog", 0.5)
    _validate_index_mode("hotlog", 25)     # int: fine
    _validate_index_mode("hotlog", None)   # uncapped: fine
    with pytest.raises(ValueError, match="index_mode"):
        _validate_index_mode("bogus", 25)
    base = spark.createDataFrame([(0, "a b c d e f")], "doc_id int, text string")
    b = spark.createDataFrame([(1, "g h i j k l")], "doc_id int, text string")
    with pytest.raises(ValueError, match="INTEGER max_doc_freq"):
        _admit_dedup_batch_indexed(
            b, 0, base, str(tmp_path / "o"), str(tmp_path / "i"),
            id_col="doc_id", text_col="text", n=3, num_hashes=8, band_size=2,
            threshold_num=1, threshold_den=2, max_doc_freq=0.5,
            max_bucket_size=None, index_mode="hotlog",
        )


def test_stream_token_cms_matches_batch_and_replays(spark, tmp_path):
    """The incrementally maintained CMS equals the batch sketch over the
    concatenated corpus CELL FOR CELL (counter merge is exact, unlike
    the LSH index there is no staleness to manage), restart-continues
    across checkpoints, and a replayed micro-batch rewrites its own
    delta rather than double-counting."""
    from pyspark_ingestion_spark.operators.profiling import token_cms_cells
    from pyspark_ingestion_spark.streaming.pipeline import (
        read_token_cms,
        stream_token_cms,
    )

    file_a = [(1, "alpha beta alpha gamma"), (2, "beta beta delta")]
    file_b = [(3, "alpha epsilon"), (4, "zeta beta alpha alpha")]
    src = str(tmp_path / "src")
    _mk_admission_files(spark, tmp_path, src, [("a", file_a)])

    cms_path = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(text_col="text", depth=4, width=32)

    def run():
        stream = (
            spark.readStream.schema("doc_id int, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_token_cms(stream, cms_path, ckpt, **kwargs)

    def cells(df):
        return {(r["i"], r["bucket"]): r["cnt"] for r in df.collect()}

    run()  # batch 0 = file a
    batch_a = spark.createDataFrame(file_a, "doc_id int, text string")
    assert cells(read_token_cms(spark, cms_path)) == cells(
        token_cms_cells(batch_a, **kwargs)
    )

    # restart: file b arrives, same checkpoint continues from the offset
    _mk_admission_files(spark, tmp_path, src, [("b", file_b)])
    run()
    both = spark.createDataFrame(file_a + file_b, "doc_id int, text string")
    merged = cells(read_token_cms(spark, cms_path))
    assert merged == cells(token_cms_cells(both, **kwargs))

    # replay: re-running a batch id overwrites its delta, never adds
    from pyspark_ingestion_spark.sources.writers import overwrite_partitions

    from pyspark.sql import functions as F

    delta = token_cms_cells(batch_a, **kwargs).withColumn("__batch_id", F.lit(0))
    overwrite_partitions(delta, cms_path, ["__batch_id"])
    assert cells(read_token_cms(spark, cms_path)) == merged

    # the sketch estimates really come from these cells: 'alpha' appears
    # 5x across both files and CMS can only overestimate
    import hashlib

    def bucket(i, term, width=32):
        return int(hashlib.md5(f"{i}|{term}".encode()).hexdigest()[:15], 16) % width

    est = min(merged.get((i, bucket(i, "alpha")), 0) for i in range(4))
    assert est >= 5


def test_hotlog_bootstrap_crash_window_rerolls(spark, tmp_path):
    """The hotlog bootstrap's write order is load-bearing: dfcnt is the
    completion probe AND the last table written, so a crash after the
    hot write but before the dfcnt write re-runs the (idempotent)
    bootstrap on the next batch instead of proceeding with a
    half-seeded index. Simulated by deleting dfcnt from a completed
    bootstrap: the next batch must restore it and admit exactly what an
    uninterrupted run admits."""
    import shutil

    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
    )

    # boilerplate shingle over the cap in the BASE corpus — the hot seed
    # whose loss the old probe order could never repair
    base = spark.createDataFrame(
        [(0, "one two three four aaa bbb ccc"),
         (1, "five six seven eight aaa bbb ccc"),
         (2, "nine ten eleven twelve aaa bbb ccc")],
        "doc_id int, text string",
    )
    b0 = spark.createDataFrame(
        [(10, "thirteen fourteen fifteen sixteen aaa bbb ccc")],
        "doc_id int, text string",
    )
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=2, max_bucket_size=None, index_mode="hotlog")

    from pyspark_ingestion_spark.streaming.pipeline import (
        init_dedup_admission_index,
    )

    init_kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                       band_size=2, max_doc_freq=2, index_mode="hotlog")

    out_a, idx_a = str(tmp_path / "out_a"), str(tmp_path / "idx_a")
    _admit_dedup_batch_indexed(b0, 0, base, out_a, idx_a, **kwargs)
    clean = {r["doc_id"] for r in spark.read.parquet(out_a).collect()}

    out_b, idx_b = str(tmp_path / "out_b"), str(tmp_path / "idx_b")
    # simulate the crash window: the bootstrap wrote postings/bands/hot
    # but died before dfcnt (its LAST write = the completion probe)
    init_dedup_admission_index(base, idx_b, **init_kwargs)
    shutil.rmtree(f"{idx_b}/dfcnt")
    for t in ("postings", "bands", "hot"):
        spark.read.parquet(f"{idx_b}/{t}")  # the rest of the bootstrap exists
    _admit_dedup_batch_indexed(b0, 0, base, out_b, idx_b, **kwargs)
    # bootstrap re-ran: dfcnt restored with the base seed, admissions agree
    df = spark.read.parquet(f"{idx_b}/dfcnt")
    assert df.filter(F.col("__batch_id").cast("long") == -1).head(1)
    got = {r["doc_id"] for r in spark.read.parquet(out_b).collect()}
    assert got == clean, (got, clean)


def test_compact_admission_bands_preserves_admissions(spark, tmp_path):
    """Folding the versioned band partitions into the base partition is
    invisible to admission: across a forced cap transition (which writes
    re-band versions — the very rows latest-wins exists for), the
    effective band table before and after compaction is identical, only
    partition -1 survives, and the next batch admits exactly what an
    uncompacted twin index admits. Compaction is also idempotent."""
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        _read_latest_bands,
        compact_admission_bands,
    )

    base = spark.createDataFrame(
        [(0, "one two three four boiler plate text"),
         (1, "five six seven eight nine ten eleven")],
        "doc_id int, text string",
    )
    # batch 0 pushes the boilerplate shingle over the cap -> re-bands
    b0 = spark.createDataFrame(
        [(10, "twelve thirteen fourteen boiler plate text"),
         (11, "fifteen sixteen seventeen boiler plate text")],
        "doc_id int, text string",
    )
    b1 = spark.createDataFrame(
        [(20, "one two three four boiler plate text"),   # dup of 0
         (21, "eighteen nineteen twenty twentyone")],
        "doc_id int, text string",
    )
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=2, max_bucket_size=None)

    paths = {}
    for arm in ("plain", "compacted"):
        out, idx = str(tmp_path / f"out_{arm}"), str(tmp_path / f"idx_{arm}")
        paths[arm] = (out, idx)
        _admit_dedup_batch_indexed(b0, 0, base, out, idx, **kwargs)

    out_c, idx_c = paths["compacted"]
    before = {
        tuple(r) for r in _read_latest_bands(
            spark, f"{idx_c}/bands", exclude_batch_id=-2).collect()
    }
    removed = compact_admission_bands(spark, idx_c)
    assert removed >= 1
    after = {
        tuple(r) for r in _read_latest_bands(
            spark, f"{idx_c}/bands", exclude_batch_id=-2).collect()
    }
    assert after == before
    parts = {
        r["__batch_id"]
        for r in spark.read.parquet(f"{idx_c}/bands")
        .select(F.col("__batch_id").cast("long").alias("__batch_id"))
        .distinct().collect()
    }
    assert parts == {-1}, parts
    assert compact_admission_bands(spark, idx_c) == 0  # idempotent

    for arm in ("plain", "compacted"):
        out, idx = paths[arm]
        _admit_dedup_batch_indexed(b1, 1, base, out, idx, **kwargs)
    admitted = {
        arm: {r["doc_id"] for r in spark.read.parquet(paths[arm][0]).collect()}
        for arm in paths
    }
    assert admitted["plain"] == admitted["compacted"]
    assert 20 not in admitted["plain"] and 21 in admitted["plain"]


def test_compact_admission_bands_staging_resume_and_commit_guard(spark, tmp_path):
    """(1) WRITE-AHEAD durability: with the staging manifest present, a
    re-run resumes from the staged rows even if the base partition was
    destroyed mid-overwrite (the exact crash window dynamic overwrite
    opens) — nothing banded only at bootstrap is lost. (2) The
    checkpoint guard refuses to fold a band partition with no commit
    marker, and accepts once the marker exists."""
    import json
    import os
    import shutil

    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        _read_latest_bands,
        compact_admission_bands,
    )

    base = spark.createDataFrame(
        [(0, "one two three four five six seven"),
         (1, "eight nine ten eleven twelve thirteen")],
        "doc_id int, text string",
    )
    b0 = spark.createDataFrame(
        [(10, "fourteen fifteen sixteen seventeen eighteen")],
        "doc_id int, text string",
    )
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=2, max_bucket_size=None)

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    _admit_dedup_batch_indexed(b0, 0, base, out, idx, **kwargs)
    want = {
        tuple(r) for r in _read_latest_bands(
            spark, f"{idx}/bands", exclude_batch_id=-2).collect()
    }

    # (1) simulate the crashed first attempt: staging written + manifest
    # committed, base partition then DESTROYED by the interrupted
    # overwrite, batch partitions already deleted
    staging = f"{idx}/bands__compact_staging"
    _read_latest_bands(spark, f"{idx}/bands", exclude_batch_id=-2).write.mode(
        "overwrite"
    ).parquet(staging)
    with open(os.path.join(staging, "_manifest.json"), "w") as f:
        json.dump({"covered": [0]}, f)
    shutil.rmtree(f"{idx}/bands/__batch_id=-1")
    shutil.rmtree(f"{idx}/bands/__batch_id=0")
    assert compact_admission_bands(spark, idx) == 1  # resumes from staging
    got = {
        tuple(r) for r in _read_latest_bands(
            spark, f"{idx}/bands", exclude_batch_id=-2).collect()
    }
    assert got == want
    assert not os.path.exists(staging)

    # (2) commit guard: a band partition without a commit marker refuses
    out2, idx2 = str(tmp_path / "out2"), str(tmp_path / "idx2")
    ckpt = str(tmp_path / "ckpt")
    _admit_dedup_batch_indexed(b0, 0, base, out2, idx2, **kwargs)
    os.makedirs(os.path.join(ckpt, "commits"), exist_ok=True)
    with pytest.raises(ValueError, match="no commit marker"):
        compact_admission_bands(spark, idx2, checkpoint=ckpt)
    with open(os.path.join(ckpt, "commits", "0"), "w") as f:
        f.write("v1")
    assert compact_admission_bands(spark, idx2, checkpoint=ckpt) == 1


def test_compact_admission_index_hotlog_tables(spark, tmp_path):
    """Full-index compaction on a hotlog index: dfcnt folds by exact
    per-shingle SUM (delta partitions are counters), hot by distinct
    union, bands by latest-wins — cumulative df counts, the hot set,
    and subsequent admissions are all invariant, and each table ends
    single-partitioned. The uncompacted twin admits identically."""
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        compact_admission_index,
    )

    base = spark.createDataFrame(
        [(0, "one two three four boiler plate text"),
         (1, "five six seven eight nine ten eleven")],
        "doc_id int, text string",
    )
    b0 = spark.createDataFrame(
        [(10, "twelve thirteen fourteen boiler plate text")],
        "doc_id int, text string",
    )
    b1 = spark.createDataFrame(
        [(20, "fifteen sixteen seventeen boiler plate text"),  # crosses cap
         (21, "eighteen nineteen twenty twentyone twentytwo")],
        "doc_id int, text string",
    )
    b2 = spark.createDataFrame(
        [(30, "one two three four boiler plate text"),   # dup of 0
         (31, "alpha beta gamma delta epsilon zeta")],
        "doc_id int, text string",
    )
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=2, max_bucket_size=None, index_mode="hotlog")

    paths = {}
    for arm in ("plain", "compacted"):
        out, idx = str(tmp_path / f"out_{arm}"), str(tmp_path / f"idx_{arm}")
        paths[arm] = (out, idx)
        _admit_dedup_batch_indexed(b0, 0, base, out, idx, **kwargs)
        _admit_dedup_batch_indexed(b1, 1, base, out, idx, **kwargs)

    out_c, idx_c = paths["compacted"]

    def dfcnt_totals(idx):
        return {
            r["shingle"]: r["total"]
            for r in spark.read.parquet(f"{idx}/dfcnt")
            .groupBy("shingle").agg(F.sum("cnt").alias("total")).collect()
        }

    def hot_set(idx):
        return {r["shingle"]
                for r in spark.read.parquet(f"{idx}/hot").collect()}

    cnt_before, hot_before = dfcnt_totals(idx_c), hot_set(idx_c)
    removed = compact_admission_index(spark, idx_c)
    assert removed["bands"] >= 1 and removed["dfcnt"] >= 1
    assert dfcnt_totals(idx_c) == cnt_before
    assert hot_set(idx_c) == hot_before
    for t in ("bands", "dfcnt", "hot"):
        parts = {
            r["__batch_id"]
            for r in spark.read.parquet(f"{idx_c}/{t}")
            .select(F.col("__batch_id").cast("long").alias("__batch_id"))
            .distinct().collect()
        }
        assert parts == {-1}, (t, parts)

    for arm in ("plain", "compacted"):
        out, idx = paths[arm]
        _admit_dedup_batch_indexed(b2, 2, base, out, idx, **kwargs)
    admitted = {
        arm: {(r["__batch_id"], r["doc_id"])
              for r in spark.read.parquet(paths[arm][0])
              .select("__batch_id", "doc_id").collect()}
        for arm in paths
    }
    assert admitted["plain"] == admitted["compacted"]


def test_compact_versioned_table_aborts_on_mid_merge_landing(spark, tmp_path):
    """The offline precondition is now DETECTED, not assumed (ADVICE r6):
    if a batch partition lands between the covered listing and the merge
    scan — so its rows are in staging but its partition is not in the
    delete set, a silent double-count for the dfcnt SUM merge — the run
    aborts BEFORE the manifest, rolls staging back, and a clean re-run
    folds everything exactly once."""
    import os

    from pyspark_ingestion_spark.streaming.pipeline import (
        _compact_versioned_table,
    )

    table = str(tmp_path / "dfcnt")
    for b, cnt in ((-1, 5), (0, 2)):
        spark.createDataFrame([("sh", cnt)], "shingle string, cnt long").write.parquet(
            f"{table}/__batch_id={b}"
        )

    def racing_merge(path, keep_ids):
        # a streaming batch commits while the merge scan runs
        spark.createDataFrame([("sh", 7)], "shingle string, cnt long").write.parquet(
            f"{path}/__batch_id=1"
        )
        return (
            spark.read.parquet(path)
            .filter(F.col("__batch_id").cast("long").isin(keep_ids))
            .groupBy("shingle").agg(F.sum("cnt").alias("cnt"))
        )

    with pytest.raises(RuntimeError, match="landed during the merge scan"):
        _compact_versioned_table(spark, table, racing_merge, None)
    assert not os.path.exists(f"{table}__compact_staging")  # rolled back
    # nothing was folded or deleted: all three partitions intact
    parts = {int(r["__batch_id"]) for r in spark.read.parquet(table)
             .select("__batch_id").distinct().collect()}
    assert parts == {-1, 0, 1}

    # quiescent re-run folds exactly once: total conserved, one partition
    def clean_merge(path, keep_ids):
        return (
            spark.read.parquet(path)
            .filter(F.col("__batch_id").cast("long").isin(keep_ids))
            .groupBy("shingle").agg(F.sum("cnt").alias("cnt"))
        )

    assert _compact_versioned_table(spark, table, clean_merge, None) == 2
    rows = spark.read.parquet(table).collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 14
    assert {int(r["__batch_id"]) for r in rows} == {-1}
