"""Structured-Streaming extension (SURVEY §2.9).

The reference has NO real streaming operators — only polling loops and
Socket-Mode callbacks (``app.py:648-675``, ``tools/snowflake_tool.py:
75-113``).  Continuous validation is therefore an *extension*, designed
per SURVEY §2.9: an events/CDC stream drives (a) watermarked windowed
aggregation and (b) incremental re-diff of a mutating table against a
reference snapshot via ``foreachBatch``.

Both run identically on a directory source locally and on Kafka/CDC at
cluster scale — the plan is source-agnostic.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkdiff.operators.diff import bucket_summary

def read_events_stream(
    spark: SparkSession, directory: str, glob: str = "events.parquet"
) -> DataFrame:
    """Directory-based streaming source (file streams require a dir;
    ``glob`` narrows to the events table inside a testdata sf dir).

    Streams cannot infer schemas, so probe the actual physical encoding
    with a one-file batch read and reuse the batch loader's ``ts``
    normalization — the stream then survives driver testdata
    re-encodings (nanos-as-long vs native micros) exactly like batch.
    """
    from sparkdiff.session import ensure_session_confs, normalize_events_ts

    ensure_session_confs(spark)
    probe_schema = (
        spark.read.option("pathGlobFilter", glob).parquet(directory).schema
    )
    raw = (
        spark.readStream.schema(probe_schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(directory)
    )
    return normalize_events_ts(raw)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling- (or, with ``slide``, sliding-) window counts/sums with
    a late-data watermark — the streaming twin of q28/q114 (state is
    bounded by the watermark horizon × windows-per-event, so this runs
    indefinitely on an unbounded source)."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (``F.session_window``): per-user sessions
    close after ``gap`` of inactivity — the built-in counterpart of the
    custom ``applyInPandasWithState`` sessionizer, usable in both batch
    and streaming (state bounded by the watermark)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


#: compact-probe size domain for the ingest-gate Bloom filter (words =
#: m_bits/64): at or below this the filter lives as a driver dict and
#: probes as one in-row array literal; above it everything stays
#: Spark-side (join probe + union/bit_or merge) — see operators/bloom.py.
_BLOOM_COMPACT_WORDS = 8192

#: auto-mode constants for ``streaming_ingest_dedup(bloom_gate="auto",
#: key_buckets="auto")`` — the thresholds the probes established, baked
#: in so the 10⁹-doc path doesn't depend on the caller knowing them:
#: filter sized for 1% fpp with 4x headroom for appended batches; the
#: bucketed band-table layout engages only past 64M band rows (the
#: local probes measured the FLAT full read at 0.14 s of a ~4 s gate,
#: so bucketing below that is pure write-side overhead — SCALE.md), at
#: ~4M rows per partition.
_AUTO_BLOOM_FPP = 0.01
_AUTO_BLOOM_HEADROOM = 4
_AUTO_BUCKET_MIN_BAND_ROWS = 64_000_000
_AUTO_BUCKET_TARGET_ROWS = 4_000_000


def auto_bloom_geometry(n_band_keys: int) -> tuple[int, int]:
    """Derive the ingest-gate Bloom geometry from the index's own band
    count: closed-form ``bloom_size`` at :data:`_AUTO_BLOOM_FPP` with
    :data:`_AUTO_BLOOM_HEADROOM` x headroom (the filter is append-only
    between re-bootstraps, so it must absorb growth without re-sizing;
    fpp degrades gracefully past the headroom, never correctness)."""
    from sparkdiff.operators.bloom import bloom_size

    return bloom_size(
        max(1024, _AUTO_BLOOM_HEADROOM * n_band_keys), _AUTO_BLOOM_FPP
    )


def auto_key_buckets(n_band_rows: int) -> int | None:
    """Derive the band-table layout from its own size: flat below
    :data:`_AUTO_BUCKET_MIN_BAND_ROWS` (the measured regime where the
    full read is noise), else the power-of-two bucket count that puts
    ~:data:`_AUTO_BUCKET_TARGET_ROWS` rows in each partition."""
    import math

    if n_band_rows < _AUTO_BUCKET_MIN_BAND_ROWS:
        return None
    return 1 << max(
        1, math.ceil(math.log2(n_band_rows / _AUTO_BUCKET_TARGET_ROWS))
    )

#: Spark's RocksDB state-store provider: spills streaming state to local
#: disk instead of keeping it on-heap — the production choice once
#: per-executor state (sessions, dedup sets) outgrows memory.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, enabled: bool = True) -> None:
    """Toggle the RocksDB state store for queries started AFTER this call
    (the provider is fixed per query at first checkpoint; restarting an
    HDFS-backed checkpoint under RocksDB is not supported — pick the
    provider before the first run)."""
    if enabled:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def streaming_bucket_checksums(
    changes: DataFrame,
    pk: str,
    cols: Sequence[str],
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Per-bucket (count, commutative checksum) maintained as STREAMING
    state over an append-only change stream — ``dirty_pk_buckets``
    without the rescan.

    The batch operator re-reads both full tables per validation run; at
    100 TB that's two full scans per check.  Here the same bucket
    summary lineage (``operators.diff.bucket_summary``) runs as a
    streaming aggregation: each micro-batch folds its rows into the
    per-bucket sums, and because the checksum is a commutative decimal
    sum, the state after any prefix of the stream equals the batch
    summary of the rows seen so far (pinned by the batch-twin test).
    State is bounded at ``n_buckets`` rows BY CONSTRUCTION — no
    watermark needed, safe under the RocksDB provider for huge
    ``n_buckets``.
    """
    return bucket_summary(
        changes,
        pk,
        cols,
        n_buckets,
        decimal_scale,
        ts_format,
        distinct_pks=False,  # distinct aggs unsupported on streams
    )


def streaming_bucket_checksums_cdc(
    changes: DataFrame,
    pk: str,
    cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Bucket checksums over a CDC stream WITH retractions: rows whose
    ``op_col`` equals ``delete_op`` subtract their contribution, all
    others add (an update is the usual CDC delete(old)+insert(new)
    pair).  Because the state is a signed commutative sum, the bucket
    state after any prefix equals the batch :func:`~sparkdiff.operators.
    diff.bucket_summary` of the table the CDC log materializes to —
    append-only streams are the ``op``-free special case
    (:func:`streaming_bucket_checksums`).  State stays bounded at
    ``n_buckets`` rows regardless of churn.
    """
    from sparkdiff.functions.canonical import row_fingerprint

    sign = F.when(F.col(op_col) == delete_op, F.lit(-1)).otherwise(F.lit(1))
    proj = changes.select(
        sign.alias("_sign"),
        F.col(pk).cast("string").alias("pk_value"),
        row_fingerprint(changes, list(cols), decimal_scale, ts_format).alias("_fp"),
    )
    return proj.groupBy(
        F.pmod(F.xxhash64("pk_value"), F.lit(n_buckets)).alias("bucket")
    ).agg(
        F.sum("_sign").alias("n"),
        F.sum(
            F.col("_sign") * F.xxhash64("pk_value", "_fp").cast("decimal(28,0)")
        ).alias("checksum"),
    )


def streaming_ingest_dedup(
    batches: DataFrame,
    corpus: DataFrame | None,
    id_col: str,
    text_col: str,
    on_duplicates: Callable[[DataFrame, int], None],
    threshold: float = 0.7,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    hash_method: str = "xxhash64",
    index_dir: str | None = None,
    admit_clean: bool = True,
    key_buckets: int | str | None = None,
    bloom_gate: tuple[int, int] | str | None = None,
):
    """Continuous ingest-time dedup: per micro-batch of NEW documents,
    the docs that near-duplicate the EXISTING corpus are handed to
    ``on_duplicates`` as ``(corpus_id, batch_id, jaccard)`` rows — the
    streaming form of the q72 gate.

    Two corpus-index modes:

    - ``index_dir=None`` (session-lived): the corpus-side index
      (shingle sets + LSH band keys,
      :func:`~sparkdiff.operators.dedup.corpus_dedup_index`) is
      computed ONCE and persisted in memory before the stream starts;
      each micro-batch pays only its own signatures plus a band-key
      equi-join (broadcast under AQE for ingest-sized batches).  The
      index is FROZEN: batches dedup against the original corpus only.
    - ``index_dir=<path>`` (amortized, durable): the index lives as
      two parquet tables (``shingles``/``bands``).  If the directory
      is empty and ``corpus`` is given, the corpus is indexed once and
      saved (bootstrap); thereafter the corpus argument is ignored and
      may be None — restarts pay a parquet READ, never a corpus
      re-shingle.  After each micro-batch, the batch's own signature
      rows are APPENDED, so the gate also screens against previously
      ingested batches and survives stream restarts.  With
      ``admit_clean=True`` (default) only docs that passed the gate
      join the index — a near-duplicate batch doc is reported and kept
      out, matching the "admit once" curation contract; set it False
      to index every seen doc.  Per-batch cost is O(batch signatures +
      index read); corpus-side compute is never repeated.  The batch's
      shingle sets and band keys are computed ONCE per micro-batch
      (persisted, passed to the gate AND reused for the append, and
      unpersisted in ``finally`` — the scoped-reuse lifecycle
      ``incremental_near_dup_pairs(batch_shingles=...)`` documents).

    Amortized-mode scale knobs:

    - ``key_buckets=N`` (bootstrap only): writes the band table in the
      BUCKETED layout (partitioned by ``pmod(xxhash64(key), N)``) and
      every micro-batch then reads only the partitions its own band
      keys can live in (`pruned_index_bands`) — the read prune that
      matters when the corpus band table is billions of rows.  Opening
      an existing index keeps whatever layout it was written with.
    - ``key_buckets="auto"`` / ``bloom_gate="auto"``: derive both knobs
      from the index's own stats so the caller needn't know the
      thresholds the probes established.  Buckets: flat below
      :data:`_AUTO_BUCKET_MIN_BAND_ROWS` band rows (corpus docs ×
      bands — exact, each doc emits one key per band), else ~4M rows
      per partition (:func:`auto_key_buckets`).  Bloom: the stored
      geometry when a filter already exists (a grown index must adopt,
      not re-derive and refuse), else closed-form sizing from the band
      table's row count at 1% fpp with 4x append headroom
      (:func:`auto_bloom_geometry`).
    - ``bloom_gate=(m_bits, n_hashes)``: maintains a Bloom filter over
      the corpus band keys (``<index_dir>/bloom`` parquet,
      ``operators/bloom.py`` geometry) as the CHEAP pre-gate: each
      micro-batch first probes its band keys against the
      configuration-sized filter (one broadcast-free column-expression
      pass + a 1-row any() aggregate), and a batch with ZERO maybe-seen
      keys — the common case for genuinely novel content —
      short-circuits past the exact index entirely (no band read, no
      verify join; ``on_duplicates`` gets an empty frame).  Admitted
      docs' band keys are OR-merged into the filter after each batch
      (bit_or of packed words — m/64 rows).  Zero false negatives: a
      key the filter has never seen cannot be in the index, so the
      short-circuit can never hide a duplicate.

    Corpus×corpus pairs are never generated in either mode.  The
    ``pairs`` frame handed to ``on_duplicates`` is persisted for the
    callback's duration (it is evaluated again for the admit filter)
    and unpersisted before the next batch.  Returns the unstarted
    ``writeStream`` builder.
    """
    from sparkdiff.operators.dedup import (
        _shingle_sets,
        append_corpus_dedup_index,
        band_keys_from_shingles,
        corpus_dedup_index,
        incremental_near_dup_pairs,
        load_corpus_dedup_index,
        pruned_index_bands,
        save_corpus_dedup_index,
    )

    if index_dir is None:
        if corpus is None:
            raise ValueError("need corpus when index_dir is None")
        sh_c, bk_c = corpus_dedup_index(
            corpus, id_col, text_col, k, num_perm, bands, hash_method
        )
        sh_c, bk_c = sh_c.persist(), bk_c.persist()

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            pairs = incremental_near_dup_pairs(
                None,
                batch_df,
                id_col,
                text_col,
                threshold,
                k,
                num_perm,
                bands,
                hash_method,
                corpus_index=(sh_c, bk_c),
                # no per-batch cache entries: one would leak per
                # micro-batch for the stream's lifetime, and ingest
                # batches are tiny
                persist_batch=False,
            )
            on_duplicates(pairs, batch_id)

        return batches.writeStream.outputMode("append").foreachBatch(handle)

    import json
    import os

    if not os.path.isdir(os.path.join(index_dir, "bands")):
        if corpus is None:
            raise ValueError(
                "index_dir has no index yet — pass corpus to bootstrap"
            )
        if key_buckets == "auto":
            # band rows = corpus docs × bands EXACTLY (each doc emits
            # one key per band), so one cheap corpus count sizes the
            # layout without recomputing the shingle pass
            key_buckets = auto_key_buckets(corpus.count() * bands)
        save_corpus_dedup_index(
            corpus_dedup_index(
                corpus, id_col, text_col, k, num_perm, bands, hash_method
            ),
            index_dir,
            key_buckets=key_buckets,
        )
    elif key_buckets == "auto":
        key_buckets = None  # opening an existing index: stored layout wins

    # ---- optional Bloom pre-gate state --------------------------------
    # Two regimes, split at the compact-probe size domain (bloom.py):
    # small filters (<= _BLOOM_COMPACT_WORDS words) live as a driver-side
    # dict — zero-shuffle compact probe, python bit_or merge, rewritten
    # per batch; larger filters NEVER touch the driver: probe is the
    # broadcast word-table join and the update is a Spark-side
    # union + bit_or written to a sibling dir and atomically swapped.
    _composite = F.concat_ws(":", F.col("band").cast("string"), F.col("key"))
    bloom_state: dict[int, int] | None = None
    bloom_dir = os.path.join(index_dir, "bloom")
    bloom_meta = os.path.join(index_dir, "bloom_meta.json")
    if bloom_gate == "auto":
        if os.path.exists(bloom_meta):
            # a persisted filter exists: ADOPT its geometry — re-deriving
            # from a since-grown index would compute a different (m, h)
            # and refuse its own filter
            with open(bloom_meta) as fh:
                stored = json.load(fh)
            bloom_gate = (stored["m_bits"], stored["n_hashes"])
        else:
            # size from the index's own band table (one bounded count at
            # stream start; the filter is built from these same rows)
            n_rows = (
                (corpus if corpus is not None else batches)
                .sparkSession.read.parquet(os.path.join(index_dir, "bands"))
                .count()
            )
            bloom_gate = auto_bloom_geometry(n_rows)
    bloom_compact = (
        bloom_gate is not None and bloom_gate[0] // 64 <= _BLOOM_COMPACT_WORDS
    )
    if bloom_gate is not None:
        from sparkdiff.operators.bloom import bloom_build

        m_bits, n_hashes = bloom_gate
        if os.path.exists(bloom_meta):
            with open(bloom_meta) as fh:
                stored = json.load(fh)
            if (stored["m_bits"], stored["n_hashes"]) != (m_bits, n_hashes):
                raise ValueError(
                    f"bloom_gate {bloom_gate} != stored geometry {stored}"
                )

        def _spark_for_bloom():
            return (corpus if corpus is not None else batches).sparkSession

        # a stale *_next / *_old dir means a prior run crashed mid-swap;
        # the live dir (or the band-table re-bootstrap below) is the
        # source of truth, so clear the leftovers before they collide
        # with this run's swap writes
        import shutil as _shutil

        for stale in (bloom_dir + "_next", bloom_dir + "_old"):
            if os.path.isdir(stale):
                _shutil.rmtree(stale)
        if not os.path.isdir(bloom_dir):
            # bootstrap the filter from the index's own band table —
            # one read, then the filter lives as a word table on disk
            spark0 = _spark_for_bloom()
            bk_all = spark0.read.parquet(os.path.join(index_dir, "bands"))
            bloom_build(
                bk_all.select(_composite.alias("_bk")),
                "_bk",
                m_bits,
                n_hashes,
                seed="ingest-gate",
            ).coalesce(1).write.mode("overwrite").parquet(bloom_dir)
            with open(bloom_meta, "w") as fh:
                json.dump({"m_bits": m_bits, "n_hashes": n_hashes}, fh)
        if bloom_compact:
            bloom_state = {
                r["word_idx"]: r["bits"]
                for r in _spark_for_bloom().read.parquet(bloom_dir).collect()
            }

    def handle_amortized(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal bloom_state
        spark = batch_df.sparkSession
        # batch signatures ONCE per micro-batch: shingles feed the band
        # keys, the gate's verify join, AND the admit append — scoped
        # persist, unpersisted in finally (no per-batch cache leak)
        sh_b = _shingle_sets(batch_df, id_col, text_col, k).persist()
        bk_b = band_keys_from_shingles(
            sh_b, num_perm, bands, hash_method
        ).persist()
        pairs = None
        try:
            novel = False
            if bloom_gate is not None:
                from sparkdiff.operators.bloom import (
                    bloom_probe,
                    bloom_probe_compact,
                )

                m_bits, n_hashes = bloom_gate
                probe_keys = bk_b.select(_composite.alias("_bk"))
                # size-adaptive probe (bloom.py's documented domain):
                # small filters ride every row as one array literal
                # (zero shuffle); large ones broadcast-join the word
                # TABLE read straight off the persisted filter, so
                # probe cost never scales with m
                if bloom_compact:
                    probed = bloom_probe_compact(
                        probe_keys, "_bk", bloom_state,
                        m_bits, n_hashes, seed="ingest-gate",
                    )
                else:
                    probed = bloom_probe(
                        probe_keys, "_bk",
                        spark.read.parquet(bloom_dir),
                        m_bits, n_hashes, seed="ingest-gate",
                    )
                hits = (
                    probed.filter(F.col("maybe_seen")).limit(1).count()
                )
                novel = hits == 0
            if novel:
                # zero maybe-seen band keys: the exact index CANNOT
                # contain a duplicate (no false negatives) — skip the
                # band read and verify join entirely
                pairs = (
                    sh_b.select(
                        F.col("_id").alias("corpus_id"),
                        F.col("_id").alias("batch_id"),
                        F.lit(0.0).alias("jaccard"),
                    )
                    .filter(F.lit(False))
                    .persist()
                )
            else:
                sh_c = spark.read.parquet(os.path.join(index_dir, "shingles"))
                bk_c = pruned_index_bands(spark, index_dir, bk_b)
                pairs = incremental_near_dup_pairs(
                    None,
                    batch_df,
                    id_col,
                    text_col,
                    threshold,
                    k,
                    num_perm,
                    bands,
                    hash_method,
                    corpus_index=(sh_c, bk_c),
                    persist_batch=False,
                    batch_shingles=sh_b,
                    batch_band_keys=bk_b,
                ).persist()
            on_duplicates(pairs, batch_id)
            admitted_ids = sh_b.select("_id")
            if admit_clean:
                admitted_ids = admitted_ids.join(
                    pairs.select(F.col("batch_id").alias("_id")).distinct(),
                    "_id",
                    "left_anti",
                )
            # append the batch's OWN precomputed signature rows — the
            # shingle/MinHash work is never redone for the admit path
            append_corpus_dedup_index(
                (
                    sh_b.join(admitted_ids, "_id"),
                    bk_b.join(admitted_ids, "_id"),
                ),
                index_dir,
            )
            if bloom_gate is not None:
                from sparkdiff.operators.bloom import bloom_build

                m_bits, n_hashes = bloom_gate
                fresh = bloom_build(
                    bk_b.join(admitted_ids, "_id").select(
                        _composite.alias("_bk")
                    ),
                    "_bk",
                    m_bits,
                    n_hashes,
                    seed="ingest-gate",
                )
                if bloom_compact:
                    # small filter: merge on the driver (word dict is
                    # configuration-sized), then persist through the SAME
                    # rename-based swap as the large path — a plain
                    # mode("overwrite") rewrite deletes-then-writes, so a
                    # crash mid-write would leave a PARTIAL-but-present
                    # bloom dir that bootstrap would not repair, and a
                    # filter missing words admits duplicates (false
                    # negatives).  Either-old-or-new is the invariant.
                    import shutil

                    for r in fresh.collect():
                        bloom_state[r["word_idx"]] = (
                            bloom_state.get(r["word_idx"], 0) | r["bits"]
                        )
                    nxt = bloom_dir + "_next"
                    aside = bloom_dir + "_old"
                    spark.createDataFrame(
                        list(bloom_state.items()) or [(0, 0)],
                        "word_idx long, bits long",
                    ).coalesce(1).write.mode("overwrite").parquet(nxt)
                    os.rename(bloom_dir, aside)
                    os.rename(nxt, bloom_dir)
                    shutil.rmtree(aside)
                else:
                    # large filter: NEVER through the driver — Spark-side
                    # union + bit_or into a sibling dir, then a
                    # rename-based swap.  Each rename is atomic; a crash
                    # at any point leaves EITHER the old or the new
                    # filter live (plus at worst a stale _next/_old dir
                    # that bootstrap clears), never no filter at all.
                    # A stale filter only means more false "maybe",
                    # never a false negative.
                    import shutil

                    nxt = bloom_dir + "_next"
                    aside = bloom_dir + "_old"
                    old = spark.read.parquet(bloom_dir)
                    (
                        old.unionByName(fresh)
                        .groupBy("word_idx")
                        .agg(F.bit_or("bits").alias("bits"))
                        .coalesce(1)
                        .write.mode("overwrite")
                        .parquet(nxt)
                    )
                    os.rename(bloom_dir, aside)
                    os.rename(nxt, bloom_dir)
                    shutil.rmtree(aside)
        finally:
            if pairs is not None:
                pairs.unpersist()
            bk_b.unpersist()
            sh_b.unpersist()

    return (
        batches.writeStream.outputMode("append").foreachBatch(handle_amortized)
    )


def checksum_drift_monitor(
    changes: DataFrame,
    reference_df: DataFrame,
    pk: str,
    cols: Sequence[str],
    on_dirty: Callable[[DataFrame, int], None],
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
    include_clean: bool = False,
):
    """Continuous drift detection: per micro-batch, the buckets whose
    maintained stream-side checksum diverges from the (cached) reference
    summary are handed to ``on_dirty`` as ``(bucket, n, checksum,
    ref_n, ref_checksum)`` rows.

    Semantics are "dirty so far": a bucket the stream has only partially
    ingested reports dirty until its rows converge on the reference —
    monotone convergence to the batch ``dirty_pk_buckets`` answer once
    the stream catches up.  Update mode delivers only buckets touched by
    the batch, so per-batch compare work is O(touched buckets), not
    O(n_buckets).

    ``include_clean=True`` delivers EVERY touched bucket with an extra
    ``is_dirty`` flag instead of only the dirty ones — required by any
    consumer that maintains a converging alert set across micro-batches:
    a bucket that ingests its last rows and converges on the reference
    is touched-and-clean in that batch, and without the clean signal the
    consumer's stale dirty entry can never be cleared (the composed
    monitor in examples/monitoring_pipeline.py drains two rounds with a
    restart; round 1's half-ingested buckets must clear in round 2)."""
    ref = (
        bucket_summary(
            reference_df,
            pk,
            cols,
            n_buckets,
            decimal_scale,
            ts_format,
            distinct_pks=False,
        )
        .select(
            "bucket",
            F.col("n").alias("ref_n"),
            F.col("checksum").alias("ref_checksum"),
        )
        .cache()  # one reference scan for the lifetime of the monitor
    )
    state = streaming_bucket_checksums(
        changes, pk, cols, n_buckets, decimal_scale, ts_format
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        j = batch_df.join(ref, "bucket", "left_outer")
        flagged = j.withColumn(
            "is_dirty",
            ~(
                F.col("n").eqNullSafe(F.col("ref_n"))
                & F.col("checksum").eqNullSafe(F.col("ref_checksum"))
            ),
        )
        if include_clean:
            on_dirty(flagged, batch_id)
        else:
            on_dirty(flagged.filter("is_dirty").drop("is_dirty"), batch_id)

    return (
        state.writeStream.outputMode("update")
        .foreachBatch(_process)
        .trigger(availableNow=True)
    )


def incremental_validation(
    changes: DataFrame,
    reference_df: DataFrame,
    pk: str,
    on_batch: Callable[[DataFrame, int], None],
    broadcast_batch: bool = True,
):
    """Continuous re-validation: for each micro-batch of changed rows,
    cell-diff ONLY those pks against the reference snapshot and hand the
    per-batch diff to ``on_batch`` (append to a metrics sink in prod).

    This replaces the reference's 60 s polling loop with an incremental
    plan: per batch the work is |batch| rows joined against the
    reference.  ``broadcast_batch`` (default) pins the broadcast on the
    micro-batch side so the reference is scanned in place every batch —
    never shuffled — instead of waiting for AQE to discover the small
    side after an exchange.  Disable it for backfill batches that may
    not fit executor memory.
    """
    from sparkdiff.operators.diff import cell_diff

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            diff = cell_diff(
                batch_df,
                reference_df,
                pk,
                broadcast_side="hive" if broadcast_batch else None,
            )
            on_batch(diff, batch_id)

    return (
        changes.writeStream.outputMode("update")
        .foreachBatch(_process)
        .trigger(availableNow=True)
    )


def incremental_validation_to_parquet(
    changes: DataFrame,
    reference_df: DataFrame,
    pk: str,
    out_dir: str,
    broadcast_batch: bool = True,
):
    """Exactly-once metrics sink for :func:`incremental_validation`.

    ``foreachBatch`` is at-least-once: after a crash between "batch
    written" and "offset committed", the batch replays.  Writing each
    batch's diff under ``batch_id=<id>`` with DYNAMIC partition
    overwrite makes the replay idempotent — the retry overwrites its own
    partition and nothing else, so the sink converges to exactly-once
    output without a transactional store (the standard Spark pattern for
    idempotent foreachBatch sinks).
    """
    from sparkdiff.operators.diff import cell_diff

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        diff = cell_diff(
            batch_df,
            reference_df,
            pk,
            broadcast_side="hive" if broadcast_batch else None,
        ).withColumn("batch_id", F.lit(batch_id))
        (
            diff.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        changes.writeStream.outputMode("update")
        .foreachBatch(_process)
        .trigger(availableNow=True)
    )


def streaming_event_dedup(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event admission over an at-least-once source:
    ``dropDuplicatesWithinWatermark`` keyed on ``key_cols`` — the
    first arrival of each key within the watermark horizon passes,
    redeliveries (same key, any event-time within the horizon) drop,
    and the key's state entry EXPIRES once the watermark passes it.

    This is the state-bounded form: plain ``dropDuplicates`` on a
    stream keeps every key forever (state grows with the stream);
    here state is arrival-rate × horizon — the shape that runs
    indefinitely at ingest scale.  The contract is exactly-once
    within the horizon; a duplicate arriving later than the watermark
    horizon re-admits (the standard at-least-once → effectively-once
    trade every streaming dedup makes — pick the horizon from the
    source's redelivery bound)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_count_min(
    occurrences: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch as a NATIVE stateful streaming aggregation:
    ``operators/sketch.count_min_sketch``'s explode→groupBy plan run
    over an unbounded token stream.  The aggregation state is the d×w
    cell grid — bounded BY CONSTRUCTION (never by the stream), which is
    what makes this the always-on token-frequency / heavy-hitter
    monitor of an ingest pipeline: update mode emits only the cells a
    micro-batch touched, and the cumulative cell values equal the batch
    sketch over everything ingested so far (CMS's cell-wise
    mergeability IS stream/batch equivalence — pinned by the batch-twin
    test).  Probe with ``operators/sketch.cms_estimate`` against any
    candidate list; alert on cells crossing a count threshold by
    filtering the update stream."""
    from sparkdiff.operators.sketch import count_min_sketch

    return count_min_sketch(occurrences, token_col, d=d, w=w, salt=salt)


def streaming_hll(
    occurrences: DataFrame,
    token_col: str = "token",
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog registers as a NATIVE stateful streaming aggregation:
    ``operators/sketch.hll_registers``'s bucket→MAX(rho) plan run over
    an unbounded token stream — the always-on cardinality monitor
    (distinct users/tokens/keys so far) of an ingest pipeline.  State is
    the register table, bounded at 2^p rows BY CONSTRUCTION; update
    mode emits only registers a micro-batch raised, and the cumulative
    register values equal the batch sketch over everything ingested so
    far (MAX-mergeability IS stream/batch equivalence — pinned by the
    batch-twin test).  Feed any foreachBatch consumer into
    ``operators/sketch.hll_estimate`` for the NDV number; duplicates
    across micro-batches are free (MAX absorbs re-delivery), so the
    estimate is stable under at-least-once sources."""
    from sparkdiff.operators.sketch import hll_registers

    return hll_registers(occurrences, token_col, p=p, salt=salt)


def streaming_contamination_gate(
    batches: DataFrame,
    patterns: DataFrame,
    on_contaminated: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern_id_col: str = "test_id",
    pattern_col: str = "pat",
    max_patterns: int = 5_000_000,
):
    """Ingest-time exact-substring decontamination: per micro-batch of
    NEW documents, the (doc_id, test_id) hits against the held-out
    suite are handed to ``on_contaminated`` — the streaming form of the
    q134 screen, guarding a continuously-fed corpus the way
    :func:`streaming_ingest_dedup` guards it against near-duplicates.

    The Aho-Corasick automaton is compiled and broadcast ONCE before
    the stream starts (the suite is benchmark-sized); each micro-batch
    pays only its own one-pass scan through
    :func:`~sparkdiff.operators.contamination.scan_with_automaton` —
    no per-batch broadcast, no state or cache growth across the
    stream's lifetime.  Returns the unstarted ``writeStream`` builder.
    """
    from sparkdiff.operators.contamination import (
        MATCH_SCHEMA,
        AhoCorasick,
        scan_with_automaton,
    )

    rows = (
        patterns.select(
            F.col(pattern_id_col).cast("long").alias("pid"),
            F.col(pattern_col).cast("string").alias("pat"),
        )
        .limit(max_patterns + 1)
        .collect()
    )
    if len(rows) > max_patterns:
        raise ValueError(
            f"pattern side exceeds max_patterns={max_patterns}; the gate "
            "broadcasts the test suite — it must stay benchmark-sized"
        )
    spark = patterns.sparkSession
    bc = (
        spark.sparkContext.broadcast(AhoCorasick([(r.pid, r.pat) for r in rows]))
        if rows
        else None
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if bc is None:
            hits = batch_df.sparkSession.createDataFrame([], MATCH_SCHEMA)
        else:
            hits = scan_with_automaton(
                batch_df, bc, id_col=id_col, text_col=text_col
            )
        on_contaminated(hits, batch_id)

    return batches.writeStream.outputMode("append").foreachBatch(handle)


def streaming_expectations(stream: DataFrame, checks: list[tuple]) -> DataFrame:
    """The expectation suite (`operators/expectations.
    expectation_report`) as a NATIVE stateful streaming aggregation —
    the always-on data-quality monitor beside the Bloom/CMS/HLL gates:
    cumulative row counts and per-check violation counts over
    everything ingested so far, one report row per check in update
    mode.  State is the single row of counters (bounded by the CHECK
    LIST, not the stream) because every row-level check is a summed
    0/1 flag — mergeable across micro-batches, so the cumulative
    report equals the batch report over the union (pinned by the
    batch-twin test).  ``unique()`` checks are rejected: tuple-distinct
    counting is stream-unbounded state — run uniqueness on the at-rest
    table (q168) or key admission through
    :func:`streaming_event_dedup`."""
    from sparkdiff.operators.expectations import expectation_report

    for name, _target, flag in checks:
        if flag is None:
            raise ValueError(
                "unique() checks need distinct aggregation (unbounded "
                f"state over a stream): {name!r} — run it on the "
                "at-rest table instead"
            )
    return expectation_report(stream, checks)
