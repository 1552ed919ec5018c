"""Streaming corpus ingest: the training-corpus pre-filter running
incrementally over a document stream.

Every stage of the batch pipeline that is narrow stays IDENTICAL on
the stream (unified semantics): language/quality/stopword gates,
benchmark decontamination, fingerprint derivation. The two stages
that need adapting are exactly the stateful ones:

- exact dedup: the batch per-fingerprint window becomes
  ``dropDuplicatesWithinWatermark(["fp"])`` - cross-micro-batch
  suppression with state that ages out past the watermark (the same
  swap A27 makes for the manifest anti-join).
- decontamination: the per-doc hit-count groupBy would be a streaming
  aggregation; instead the (small, static) benchmark gram index is
  embedded as an array literal and the overlap becomes
  ``array_intersect`` - a narrow map, streamable in append mode. Eval
  suites are MBs, so the index rides the task closure the same way a
  broadcast variable would; for a rare giant index, run the batch
  pipeline under foreachBatch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
)


def _dir_exists(spark, path: str) -> bool:
    """Explicit Hadoop-FS existence probe. The ingests MUST distinguish
    "no corpus/store yet" (first batch - legitimately skip the screen)
    from "the read failed" (transient FS error, permission, corrupt
    footer): a bare ``except Exception`` around the read treated BOTH
    as first-batch, silently skipping the dedup screen AND the replay
    anti-join and admitting duplicates with no signal (ADVICE r12).
    With this probe, absence is checked explicitly and a genuine read
    error propagates and fails the micro-batch - retryable, loud."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _forbid_sheared_bucketed_store(
    spark, postings_dir: str, fn_name: str, restore_hint: str
) -> None:
    """Shared guard for both ingests (second-review: it was duplicated
    verbatim): a posting store with NO ``_meta`` sidecar is a legacy
    UNBUCKETED store - unless its on-disk layout is actually
    ``_bk=``-partitioned, in which case the sidecar was LOST and
    appending unbucketed rows would shear the layout (and, once the
    true sidecar is restored, be pruned out of every screen's
    partition filter). Fail loud with the restore instruction."""
    p = spark._jvm.org.apache.hadoop.fs.Path(postings_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if any(
        st.getPath().getName().startswith("_bk=")
        for st in fs.listStatus(p)
    ):
        raise ValueError(
            f"{fn_name}: posting store at {postings_dir} is "
            "_bk-partitioned but its _meta sidecar is missing - "
            f"restore the sidecar ({restore_hint}) before resuming"
        )


def _validate_compact_trigger(
    compact_trigger_files: int | None, floor: int, fn_name: str
) -> None:
    """A trigger at or below the post-compaction file floor (one data
    file per store bucket after ``compact_postings``; the session's
    defaultParallelism for an unbucketed store) makes EVERY batch
    re-run a full-store compaction forever - the exact pathology the
    compaction bound exists to prevent, and silent until someone reads
    the batch timings (ADVICE r14). Validated at ingest entry against
    the call's bucket count AND per batch against the store's own
    sidecar-resolved layout (a restart may resume a store built with
    different buckets)."""
    if compact_trigger_files is not None and compact_trigger_files <= floor:
        raise ValueError(
            f"{fn_name}: compact_trigger_files={compact_trigger_files} "
            f"is at or below the post-compaction file floor ({floor} - "
            "one data file per store bucket, or defaultParallelism "
            "unbucketed), so every batch would re-run a full-store "
            "compaction forever; raise the trigger, lower the bucket "
            "count, or pass None to hand maintenance to an external "
            "operator"
        )


def benchmark_gram_index(benchmark: DataFrame, text_col: str = "text", n: int = 5) -> list[str]:
    """Collect the distinct n-grams of the eval corpus (driver-side,
    eval-suite sized)."""
    from ..operators.dedup import word_shingles

    return [
        r["_g"]
        for r in benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("_g")
        ).distinct().collect()
    ]


def gated_doc_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "arrival_ts",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    max_stopword_ratio: float = 0.9,
    bench_grams: list[str] | None = None,
    max_benchmark_overlap: float = 0.5,
    decontam_ngram: int = 5,
    dedup_watermark: str = "1 hour",
) -> DataFrame:
    """Apply the corpus gates + decontamination + cross-batch exact
    dedup to a streaming (or batch) document frame carrying an event
    timestamp column ``ts_col``."""
    from ..operators.dedup import word_shingles

    scored = (
        docs.withColumn("lang_guess", lang_id(text_col))
        .withColumn("quality", F.round(quality_score(text_col), 6))
        .withColumn("sw_ratio", F.round(stopword_ratio(text_col), 6))
        .withColumn("fp", fingerprint(text_col))
    )
    gated = scored.filter(
        F.col("lang_guess").isin(*languages)
        & (F.col("quality") >= min_quality)
        & (F.col("sw_ratio") <= max_stopword_ratio)
    )
    if bench_grams is not None:
        grams = word_shingles(text_col, decontam_ngram)
        overlap = F.size(F.array_intersect(grams, F.lit(bench_grams))).cast(
            "double"
        ) / F.greatest(F.size(grams), F.lit(1)).cast("double")
        gated = gated.withColumn("bench_overlap", F.round(overlap, 6)).filter(
            F.col("bench_overlap") < max_benchmark_overlap
        )
    return gated.withWatermark(ts_col, dedup_watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def start_corpus_ingest_neardup(
    docs: DataFrame,
    corpus_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    max_stopword_ratio: float = 0.9,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    store_bucket_count: int = 64,
    compact_trigger_files: int | None = 256,
    corpus_bucket_count: int | None = 64,
) -> StreamingQuery:
    """Streaming ingest with NEAR-dup admission against the persistent
    corpus: per micro-batch, gate the new docs, screen them against
    the LSH posting store (operators.dedup.incremental_minhash_dedup -
    the corpus is never re-signatured), drop already-admitted ids
    (replay idempotence), then run the SEQUENTIAL intra-batch
    admission among the corpus-survivors, append their POSTINGS, and
    append the corpus rows last. foreachBatch because the batch both
    READS and APPENDS two tables - the sanctioned multi-sink shape,
    checkpoint-as-ack making replays idempotent at the source level.

    The CORPUS is bucketed like the store (VERDICT r14): written
    ``partitionBy("_ck")``, ``_ck = pmod(xxhash64(id),
    corpus_bucket_count)``, bucket count in a ``corpus_store`` _meta
    sidecar. The Jaccard VERIFY leg reads only the candidate ids'
    buckets (``incremental_minhash_dedup``'s ``corpus_loader`` hook)
    and the replay anti-joins read only the BATCH ids' buckets - so
    the per-batch corpus cost tracks candidate/batch bucket coverage,
    never corpus size (equal ids share a bucket: pruned == full). A
    legacy unpartitioned corpus keeps full scans and unpartitioned
    appends; migrate with ``corpus_store.bucket_corpus`` (ingest
    stopped).

    Semantics: the admitted set is exactly what one-doc-at-a-time
    arrival (ascending id within a batch, batch order across batches)
    would produce. Corpus screen runs FIRST because a corpus-rejected
    doc is rejected under any arrival order and must not block a batch
    sibling; intra-batch admission is the greedy min-id-first pass
    (operators.dedup.greedy_admission_drops), not "drop the greater id
    of every pair" - that over-dropped on similarity chains (ADVICE
    r12: for a<b<c with a~b, b~c, a!~c it discarded c although c's
    only similar partner b was itself dropped).

    Durability (mirrors the exact variant, VERDICT r12): postings are
    appended BEFORE corpus rows - a crash between the appends leaves
    orphan postings, which are harmless (the screen's verify joins
    candidates back to CORPUS text, so a posting with no corpus row
    never rejects anything; a replay appends duplicate postings,
    absorbed by the candidate dropDuplicates and reclaimed by
    operators.fuzzy.compact_postings). The reverse order left admitted
    docs WITHOUT postings after a crash: invisible to every future
    screen, a permanent silent recall hole. The corpus and store reads
    are INDEPENDENT fs.exists probes: a corpus without its store fails
    loud (screening against nothing would admit duplicates of the
    whole corpus), and a genuine read error fails the batch instead of
    masquerading as first-batch.

    The store carries its LSH build parameters (num_hashes, bands,
    shingle_n, threshold) in a one-row ``_meta`` sidecar, written
    before the first postings append and validated every batch: band
    hashes from mismatched parameters simply never collide, so a
    parameter drift across restarts would not fail - it would
    silently admit duplicates of the whole corpus, the worst failure
    mode this module has. Legacy stores without the sidecar get it
    written forward under the CURRENT parameters (the caller is
    asserting continuity, exactly what resuming the ingest means).

    Maintenance is wired IN (VERDICT r13): when the store's data-file
    count reaches ``compact_trigger_files`` after a batch's appends,
    the batch runs ``operators.fuzzy.compact_postings`` in-line -
    replay growth reclaims itself without an operator remembering to
    (the compact_files/skipping-index auto-refresh discipline). The
    trigger probe is ONE recursive listing (metadata-bounded, no data
    read); compaction leftovers from a crash mid-swap heal at the next
    batch via ``recover_posting_store``. ``None`` disables (external
    maintenance owns the store). The trigger must exceed the
    post-compaction file floor - one data file per store bucket
    (``store_bucket_count``), or defaultParallelism unbucketed - else
    EVERY batch would rerun a full-store compaction; validated loudly
    at entry and per batch against the sidecar-resolved layout
    (ADVICE r14)."""
    from ..corpus_store import (
        append_corpus_rows,
        forbid_sheared_corpus,
        read_corpus,
        read_corpus_meta,
        write_corpus_meta,
    )
    from ..io import recover_small_table
    from ..operators.dedup import (
        band_postings,
        greedy_admission_drops,
        incremental_minhash_dedup,
        minhash_dedup_pairs,
        read_band_meta,
        write_band_meta,
    )
    from ..operators.fuzzy import (
        compact_postings,
        posting_store_file_count,
        recover_posting_store,
    )

    _validate_compact_trigger(
        compact_trigger_files, store_bucket_count,
        "start_corpus_ingest_neardup",
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # heal a crashed compaction BEFORE probing the store: mid-swap
        # leftovers otherwise read as a missing/half store and fail
        # the batch until an operator intervenes.
        # ONLY in auto-maintenance mode: with the trigger disabled an
        # EXTERNAL operator owns the store's maintenance, and
        # self-healing here would race a live compaction's swap window
        # (review finding - restoring __old mid-swap breaks the
        # external pass's rollback and can re-duplicate the postings
        # it just removed)
        if compact_trigger_files is not None:
            recover_posting_store(spark, postings_dir)
        scored = (
            batch.withColumn("lang_guess", lang_id(text_col))
            .withColumn("quality", F.round(quality_score(text_col), 6))
            .withColumn("sw_ratio", F.round(stopword_ratio(text_col), 6))
            .withColumn("fp", fingerprint(text_col))
        )
        gated = scored.filter(
            F.col("lang_guess").isin(*languages)
            & (F.col("quality") >= min_quality)
            & (F.col("sw_ratio") <= max_stopword_ratio)
        ).localCheckpoint()
        if gated.isEmpty():
            return
        idt = gated.schema[id_col].dataType.simpleString()
        store_exists = _dir_exists(spark, postings_dir)
        # like the exact variant: the store's contract (LSH params,
        # bucket layout) comes from ITS OWN sidecar, never from this
        # call's parameters, which a restart may have changed
        buckets: int | None = store_bucket_count
        if store_exists:
            meta = read_band_meta(spark, postings_dir)
            want = {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_n": shingle_n,
                "p_num": round(jaccard_threshold * 1_000_000),
            }
            if meta is not None:
                have = {k: meta[k] for k in want}
                if have != want:
                    raise ValueError(
                        "start_corpus_ingest_neardup: posting store at "
                        f"{postings_dir} was built with {have}, ingest "
                        f"requested {want} - mismatched LSH parameters "
                        "never collide in bands, which would silently "
                        "admit duplicates; rebuild the store or resume "
                        "with its parameters"
                    )
                buckets = meta["buckets"]
            else:
                _forbid_sheared_bucketed_store(
                    spark, postings_dir, "start_corpus_ingest_neardup",
                    "write_band_meta with the original parameters and "
                    "bucket count",
                )
                # legacy store: unbucketed layout on disk; record the
                # contract forward and keep appends layout-consistent
                buckets = None
                write_band_meta(
                    spark, postings_dir, num_hashes, bands, shingle_n,
                    jaccard_threshold, buckets=None,
                )
        _validate_compact_trigger(
            compact_trigger_files,
            buckets
            if buckets is not None
            else spark.sparkContext.defaultParallelism,
            "start_corpus_ingest_neardup",
        )
        # heal a crashed bucket_corpus migration before probing the
        # corpus (mutator self-recovery, same as the store above)
        recover_small_table(spark, corpus_dir)
        corpus_exists = _dir_exists(spark, corpus_dir)
        if corpus_exists:
            # corpus layout from ITS OWN sidecar (a restart may have
            # changed the parameter); no sidecar = legacy full-scan
            # corpus, unless the on-disk layout is sheared
            cbuckets = read_corpus_meta(spark, corpus_dir)
            if cbuckets is None:
                forbid_sheared_corpus(
                    spark, corpus_dir, "start_corpus_ingest_neardup"
                )
        else:
            cbuckets = corpus_bucket_count
        if corpus_exists:
            if not store_exists:
                raise ValueError(
                    "start_corpus_ingest_neardup: corpus exists at "
                    f"{corpus_dir} but the posting store "
                    f"{postings_dir} is missing - rebuild it with "
                    "operators.dedup.band_postings over the corpus "
                    "before resuming (screening without it would "
                    "silently admit duplicates)"
                )
            # explicit schemas: an exists-but-empty directory (crashed
            # first append) must read as an EMPTY table, not an
            # inference error misread as absence
            schema = f"{id_col} {idt}, band_idx int, band_hash bigint"
            if buckets is not None:
                schema += ", _bk int"
            store = spark.read.schema(schema).parquet(postings_dir)

            def corpus_texts_for(ids_df: DataFrame) -> DataFrame:
                # partition-pruned verify read: only the candidate
                # ids' _ck buckets are scanned and re-shingled (full
                # scan on a legacy corpus, cbuckets None)
                return read_corpus(
                    spark, corpus_dir, gated.schema, cbuckets,
                    prune_ids=ids_df, id_col=id_col,
                ).select(id_col, text_col)

            survivors, surv_post = incremental_minhash_dedup(
                gated, store, None,
                id_col, text_col, num_hashes=num_hashes, bands=bands,
                jaccard_threshold=jaccard_threshold, shingle_n=shingle_n,
                store_buckets=buckets, corpus_loader=corpus_texts_for,
            )
            # replay idempotence: ids already in the corpus never
            # re-append even if the similarity screen would admit
            # (the postings side gets the same filter so it stays the
            # survivors' posting set). Pruned to the BATCH ids'
            # buckets - an equal id shares a bucket, so the pruned
            # read sees every id the full read could veto with
            corpus_ids = read_corpus(
                spark, corpus_dir, gated.schema, cbuckets,
                prune_ids=gated.select(id_col), id_col=id_col,
            ).select(id_col)
            survivors = survivors.join(corpus_ids, id_col, "left_anti")
            # batch-postings-sized snapshot: the append consumes this
            # lazily AFTER the corpus/store reads, and an
            # un-checkpointed lineage would re-run the whole screen a
            # second time per trigger (second-review finding)
            surv_post = surv_post.join(
                corpus_ids, id_col, "left_anti"
            ).localCheckpoint()
        else:
            survivors = gated
            surv_post = None
        survivors = survivors.localCheckpoint()
        pairs = minhash_dedup_pairs(
            survivors, id_col, text_col, num_hashes=num_hashes,
            bands=bands, jaccard_threshold=jaccard_threshold,
            shingle_n=shingle_n,
        )
        # doomed is consumed twice (the corpus anti-join AND the
        # postings anti-join) and is rejected-id-sized: snapshot it
        doomed = greedy_admission_drops(pairs).withColumnRenamed(
            "id", id_col
        ).localCheckpoint()
        # one deterministic snapshot: admitted feeds both appends (and
        # the postings derivation), and the corpus append must not be
        # re-evaluated lazily AFTER the store has grown
        admitted = survivors.join(doomed, id_col, "left_anti").localCheckpoint()
        if not store_exists:
            # sidecar BEFORE any postings: a crash right after leaves
            # a store that is empty but already carries its contract
            write_band_meta(
                spark, postings_dir, num_hashes, bands, shingle_n,
                jaccard_threshold, buckets=store_bucket_count,
            )
        if not corpus_exists and cbuckets is not None:
            # corpus sidecar AFTER the store's (the corpus-exists
            # probe must never find a corpus whose store is missing)
            # and BEFORE any corpus rows - same crash ordering
            write_corpus_meta(spark, corpus_dir, cbuckets)
        # the admitted docs' postings REUSE the signature pass the
        # corpus screen already ran (incremental_minhash_dedup's
        # second return), filtered by the drop set - not a fresh
        # band_postings(admitted) run (review finding: the batch was
        # being re-signatured a third time per trigger); only the
        # first batch, which ran no screen, signatures here
        if surv_post is None:
            surv_post = band_postings(
                survivors, id_col, text_col, num_hashes=num_hashes,
                bands=bands, shingle_n=shingle_n,
            )
        new_postings = surv_post.join(doomed, id_col, "left_anti")
        if buckets is not None:
            new_postings = new_postings.withColumn(
                "_bk", F.pmod(F.col("band_hash"), F.lit(buckets))
            )
        writer = new_postings.write.mode("append")
        if buckets is not None:
            writer = writer.partitionBy("_bk")
        writer.parquet(postings_dir)
        append_corpus_rows(admitted, corpus_dir, id_col, cbuckets)
        # in-line maintenance AFTER both appends: the batch is fully
        # durable, this writer is the store's only appender, and the
        # trigger probe is one metadata listing
        if (
            compact_trigger_files is not None
            and posting_store_file_count(spark, postings_dir)
            >= compact_trigger_files
        ):
            compact_postings(spark, postings_dir)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest(
    docs: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    **gate_kwargs,
) -> StreamingQuery:
    """Land the gated stream in the corpus lake, checkpoint-as-ack;
    available-now friendly (run-to-completion in tests/backfills)."""
    gated = gated_doc_stream(docs, **gate_kwargs)
    return (
        gated.writeStream.format("parquet")
        .option("path", corpus_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest_exact(
    docs: DataFrame,
    corpus_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    shingle_n: int = 3,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    max_stopword_ratio: float = 0.9,
    store_bucket_count: int = 64,
    compact_trigger_files: int | None = 256,
    corpus_bucket_count: int | None = 64,
) -> StreamingQuery:
    """Streaming ingest with EXACT Jaccard admission - the
    deterministic twin of ``start_corpus_ingest_neardup`` (LSH bands
    trade recall for speed; this tier guarantees NO qualifying
    duplicate is ever admitted, the recall-1.0 contract of
    operators.fuzzy). Per micro-batch:

    1. gate (language/quality/stopword - identical narrow stages);
    2. screen the gated batch against the PERSISTED POSTING STORE
       (``jaccard_screen_vs_postings``): admitted docs' hash-order
       prefix postings were appended at their own admission and are
       NEVER recomputed. The store is PARTITIONED by
       ``_bk = pmod(_hk, store_bucket_count)`` and the screen prunes
       its read to the batch's own posting buckets (a partition
       filter - the per-batch store cost tracks the batch's bucket
       coverage); the build threshold and bucket count live in the
       store's one-row ``_meta`` sidecar, so the per-batch threshold
       guard is a tiny sidecar read, not a second store scan (ADVICE
       r12). A legacy store without the sidecar screens via the
       distinct-_p scan once and writes the sidecar forward
       (unbucketed - rebuild to bucket it). The CORPUS side of the
       verify gets the same treatment (VERDICT r14 - the path's true
       last linear term): the corpus is written
       ``partitionBy("_ck")``, ``_ck = pmod(xxhash64(id),
       corpus_bucket_count)`` with its own ``_meta`` sidecar
       (``corpus_store``), and the screen's verify leg reads ONLY the
       partitions the candidate ids hash into
       (``corpus_store.read_corpus`` via the screen's
       ``corpus_loader`` hook) - so the per-batch corpus read tracks
       candidate bucket coverage, never corpus size. A legacy
       unpartitioned corpus (no sidecar) keeps full-scan semantics
       and unpartitioned appends; migrate it in place with
       ``corpus_store.bucket_corpus`` (stop the ingest first).
    3. id-level anti-join for crash-replay idempotence (pruned to the
       BATCH ids' corpus buckets when bucketed - equal ids share a
       bucket, so the pruned anti-join drops exactly what the full
       one would), then the
       SEQUENTIAL intra-batch admission among the corpus-survivors:
       greedy min-id-first over the exact pair graph
       (operators.dedup.greedy_admission_drops), which equals
       one-doc-at-a-time arrival in ascending-id order - screening
       first matters, because a corpus-rejected doc is rejected under
       any order and must not block a batch sibling, and the greedy
       pass (not "drop the greater id of every pair") keeps c in the
       chain a~b, b~c, a!~c after its only partner b is dropped
       (ADVICE r12);
    4. append the POSTINGS FIRST and the corpus rows second: a crash
       between the appends leaves orphan postings, which are
       harmless (the verify joins candidates back to CORPUS rows, so
       a posting with no corpus row can never reject anything, and a
       replay merely appends duplicate postings - deduped by the
       screen's candidate distinct and reclaimed by
       ``operators.fuzzy.compact_postings``). The reverse order would
       leave admitted docs WITHOUT postings after a crash: invisible
       to every future screen, a silent recall hole. On the FIRST
       admission the ``_meta`` sidecar goes down before any postings,
       so a crash at any point leaves a store whose contract is
       already recorded.

    The corpus probe is an explicit ``fs.exists`` (never a bare
    except around the read): absence means first batch; a genuine
    read error fails the micro-batch loudly instead of silently
    skipping the screen and the idempotence anti-join (ADVICE r12).

    Maintenance is wired IN (VERDICT r13): when the store's data-file
    count reaches ``compact_trigger_files`` after a batch's appends,
    the batch runs ``operators.fuzzy.compact_postings`` in-line; the
    trigger probe is one recursive metadata listing, and compaction
    crash leftovers heal at the next batch via
    ``recover_posting_store``. ``None`` disables. The trigger must
    exceed the post-compaction file floor (one file per store bucket,
    or defaultParallelism unbucketed) - validated loudly at entry and
    per batch, else every batch would rerun a full compaction
    (ADVICE r14).

    Similarity domain is word ``shingle_n``-gram sets
    (operators.dedup.word_shingles, pure Catalyst); docs too short to
    shingle cannot match anything and are admitted. Admission is
    ORDER-DEPENDENT across batches by design (first arrival wins) -
    the same contract every sequential admission policy has."""
    from ..corpus_store import (
        append_corpus_rows,
        forbid_sheared_corpus,
        read_corpus,
        read_corpus_meta,
        write_corpus_meta,
    )
    from ..io import recover_small_table
    from ..operators.dedup import greedy_admission_drops, word_shingles
    from ..operators.fuzzy import (
        compact_postings,
        jaccard_prefix_join,
        jaccard_prefix_postings,
        jaccard_screen_vs_postings,
        posting_store_file_count,
        read_postings_meta,
        recover_posting_store,
        write_postings_meta,
    )

    _validate_compact_trigger(
        compact_trigger_files, store_bucket_count,
        "start_corpus_ingest_exact",
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # heal a crashed compaction BEFORE probing the store (mid-swap
        # leftovers otherwise read as missing/half a store).
        # ONLY in auto-maintenance mode: with the trigger disabled an
        # EXTERNAL operator owns the store's maintenance, and
        # self-healing here would race a live compaction's swap window
        # (review finding - restoring __old mid-swap breaks the
        # external pass's rollback and can re-duplicate the postings
        # it just removed)
        if compact_trigger_files is not None:
            recover_posting_store(spark, postings_dir)
        gated = batch.withColumn("lang_guess", lang_id(text_col)).filter(
            F.col("lang_guess").isin(*languages)
            & (F.round(quality_score(text_col), 6) >= min_quality)
            & (F.round(stopword_ratio(text_col), 6) <= max_stopword_ratio)
        )
        if gated.isEmpty():
            return
        # materialize ONCE: the screen references the batch three
        # times (its postings, its token arrays, the anti-join) and
        # each reference would otherwise re-run the shingle chain -
        # the branch-count-vs-recompute regression the dedup-first
        # tier's first cut already paid for (review-caught)
        toks = gated.withColumn(
            "_toks", word_shingles(text_col, shingle_n)
        ).localCheckpoint()
        idt = toks.schema[id_col].dataType.simpleString()
        # the store's contract (threshold, bucket layout) is resolved
        # from ITS OWN sidecar whenever the store exists - never from
        # this call's parameters, which a restart may have changed; a
        # threshold drift must fail loud even on the crash-window
        # replay where the corpus append never landed
        store_exists = _dir_exists(spark, postings_dir)
        meta = read_postings_meta(spark, postings_dir) if store_exists else None
        if store_exists:
            buckets = meta["buckets"] if meta is not None else None
            if meta is None:
                _forbid_sheared_bucketed_store(
                    spark, postings_dir, "start_corpus_ingest_exact",
                    "write_postings_meta with the original threshold "
                    "and bucket count",
                )
        else:
            buckets = store_bucket_count
        p_req = round(jaccard_threshold * 1_000_000)
        if meta is not None and meta["p_num"] != p_req:
            raise ValueError(
                "start_corpus_ingest_exact: posting store at "
                f"{postings_dir} was built at threshold "
                f"p={meta['p_num']}/1e6, ingest requested p={p_req}/1e6 "
                "- rebuild the store or ingest at its threshold"
            )
        _validate_compact_trigger(
            compact_trigger_files,
            buckets
            if buckets is not None
            else spark.sparkContext.defaultParallelism,
            "start_corpus_ingest_exact",
        )
        if store_exists and meta is None:
            # legacy (pre-sidecar) store: validate its threshold by
            # the one-time distinct-_p scan HERE - independent of the
            # corpus probe (review finding: validating only inside the
            # corpus branch let a crash-window replay, where the
            # corpus append never landed, append postings at a NEW
            # threshold into the old store before any check ran) -
            # then record the sidecar so the scan never recurs
            legacy = spark.read.schema(
                f"_id {idt}, _n int, _hk bigint, _p int"
            ).parquet(postings_dir)
            wrong = sorted(
                p["_p"]
                for p in legacy.select("_p").distinct().collect()
                if p["_p"] != p_req
            )
            if wrong:
                raise ValueError(
                    "start_corpus_ingest_exact: legacy posting store "
                    f"at {postings_dir} holds postings built at "
                    f"threshold p={wrong}/1e6, ingest requested "
                    f"p={p_req}/1e6 - rebuild the store or ingest at "
                    "its threshold"
                )
            write_postings_meta(
                spark, postings_dir, jaccard_threshold, buckets=None
            )
            meta = {"p_num": p_req, "buckets": None}
        # heal a crashed bucket_corpus migration (live dir missing,
        # __old intact) before probing the corpus: the mutator
        # self-recovery rule, same as the posting store above
        recover_small_table(spark, corpus_dir)
        corpus_exists = _dir_exists(spark, corpus_dir)
        if corpus_exists:
            # the corpus layout comes from ITS OWN sidecar, never this
            # call's parameter (a restart may have changed it); no
            # sidecar = legacy unpartitioned corpus -> full scans and
            # unpartitioned appends, unless the layout is sheared
            cbuckets = read_corpus_meta(spark, corpus_dir)
            if cbuckets is None:
                forbid_sheared_corpus(
                    spark, corpus_dir, "start_corpus_ingest_exact"
                )
        else:
            cbuckets = corpus_bucket_count
        if corpus_exists:
            # a MISSING store next to an existing corpus is
            # corruption/migration and must fail loud, never screen
            # nothing silently
            if not store_exists:
                raise ValueError(
                    "start_corpus_ingest_exact: corpus exists at "
                    f"{corpus_dir} but the posting store "
                    f"{postings_dir} is missing - rebuild it with "
                    "jaccard_prefix_postings over the corpus before "
                    "resuming (screening without it would silently "
                    "admit duplicates)"
                )
            # explicit schema: a store holding only unshingleable
            # admissions has zero part files, which is a LEGITIMATE
            # state (nothing to screen against), not an inference
            # error
            schema = f"_id {idt}, _n int, _hk bigint, _p int"
            if buckets is not None:
                schema += ", _bk int"
            store = spark.read.schema(schema).parquet(postings_dir)

            def corpus_rows_for(ids_df: DataFrame) -> DataFrame:
                # partition-pruned verify read: only the candidate
                # ids' _ck buckets are scanned (full scan on a legacy
                # corpus, cbuckets None)
                return read_corpus(
                    spark, corpus_dir, gated.schema, cbuckets,
                    prune_ids=ids_df, id_col=id_col,
                ).select(
                    id_col,
                    word_shingles(text_col, shingle_n).alias("_toks"),
                )

            hits = jaccard_screen_vs_postings(
                toks.select(id_col, "_toks"),
                store,
                None,
                id_col,
                "_toks",
                jaccard_threshold,
                # meta is always present here: first-write stores get
                # the sidecar before any postings, legacy stores had
                # it validated and written forward above
                store_p_num=meta["p_num"],
                store_buckets=buckets,
                corpus_loader=corpus_rows_for,
            )
            survivors = toks.join(
                hits.select(F.col("right_id").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
            # replay idempotence: ids already in the corpus never
            # re-append even if the similarity screen would admit -
            # this anti-join runs whenever the CORPUS exists,
            # independent of the store's state. Pruned to the BATCH
            # ids' buckets: an equal id shares a bucket, so the pruned
            # read sees every id the full read could veto with
            survivors = survivors.join(
                read_corpus(
                    spark, corpus_dir, gated.schema, cbuckets,
                    prune_ids=toks.select(id_col), id_col=id_col,
                ).select(id_col),
                id_col,
                "left_anti",
            ).localCheckpoint()
        else:
            survivors = toks
        # sequential intra-batch admission among the survivors: pairs
        # restricted to survivor endpoints is exact (a corpus-rejected
        # or already-admitted endpoint never blocks anyone)
        pairs = jaccard_prefix_join(
            survivors, id_col, "_toks", jaccard_threshold
        )
        doomed = greedy_admission_drops(pairs).withColumnRenamed(
            "id", id_col
        )
        admitted = survivors.join(doomed, id_col, "left_anti").localCheckpoint()
        if not store_exists:
            # sidecar BEFORE any postings: a crash right after leaves
            # a store that is empty but already carries its contract
            write_postings_meta(
                spark, postings_dir, jaccard_threshold,
                buckets=store_bucket_count,
            )
        if not corpus_exists and cbuckets is not None:
            # corpus sidecar AFTER the store's (so a corpus-exists
            # probe never finds a corpus whose store is missing) and
            # BEFORE any corpus rows - same crash ordering as above
            write_corpus_meta(spark, corpus_dir, cbuckets)
        new_postings = jaccard_prefix_postings(
            admitted.select(id_col, "_toks"),
            id_col,
            "_toks",
            jaccard_threshold,
            bucket_by=buckets,
        )
        writer = new_postings.write.mode("append")
        if buckets is not None:
            writer = writer.partitionBy("_bk")
        writer.parquet(postings_dir)
        append_corpus_rows(
            admitted.drop("_toks"), corpus_dir, id_col, cbuckets
        )
        # in-line maintenance AFTER both appends (see the near-dup
        # variant): metadata-bounded trigger, single-appender store
        if (
            compact_trigger_files is not None
            and posting_store_file_count(spark, postings_dir)
            >= compact_trigger_files
        ):
            compact_postings(spark, postings_dir)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest_dsir(
    docs: DataFrame,
    corpus_dir: str,
    model_dir: str,
    checkpoint_dir: str,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_log_weight: float = 0.0,
    m: int = 8192,
    seed: int = 42,
    algo: str = "xxhash64",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    max_stopword_ratio: float = 0.9,
    corpus_bucket_count: int | None = 64,
    refresh_target: bool = False,
) -> StreamingQuery:
    """Streaming ingest with DSIR target-matched admission
    (operators.dsir on a live stream): per micro-batch, gate the new
    docs (language/quality/stopword - the shared narrow stages), weight
    each against the CURRENT importance model (fixed hashed-ngram
    target counts vs the accumulated raw counts of everything streamed
    so far), admit docs with ``log_weight >= min_log_weight``, append
    them to the corpus, then fold the batch's bucket counts into the
    persisted raw model. The model state is TWO m-row tables under
    ``model_dir`` (`target` written once at stream start, `raw`
    re-published per batch via the crash-safe publish_small_table
    swap) - O(m) state forever, the DSIR scale contract.

    Semantics and ordering (deliberate, and DIFFERENT from the posting
    ingests' postings-first rule because the model is a scoring PRIOR,
    not a recall structure):

    - q_raw is the distribution of the GATE-SURVIVING stream
      (admitted or not, but AFTER the language/quality/stopword
      gates - gate-rejected docs never fold into the raw model).
      This is deliberate, and differs from the paper's raw-pool-is-
      everything formulation: selection happens among gate survivors,
      so the importance baseline that makes ``min_log_weight``
      meaningful is the survivor distribution - folding docs the
      gates already removed would bias every weight toward content
      that can never be admitted (ADVICE r14: tune min_log_weight
      against the gated stream, not the wire stream).
    - corpus MARKER, then corpus append, then model publish LAST,
      with the applied batch_id recorded IN the raw-model table AND a
      corpus-side ``_append_marker`` sidecar (one row, the batch id,
      published crash-safe BEFORE the append). The marker makes the
      replay anti-join REPLAY-ONLY (VERDICT r14 item 2): on the
      common path the marker from the last completed batch is <
      batch_id, so the batch runs with ZERO corpus reads - O(batch)
      work plus the O(m) model fold. Only when the marker reads >=
      batch_id (a crash landed somewhere after the marker publish)
      does the id anti-join run, re-weighted under the UNCHANGED
      model (same weights, same admitted set), and then pruned to the
      admitted ids' ``_ck`` buckets when the corpus is bucketed
      (``corpus_store``, corpus_bucket_count) so even the replay read
      is bucket-bounded. A raw-model marker >= batch_id still means
      the whole batch completed - full no-op, as before.
    - an empty raw model (first batch) weights with add-one smoothing
      over zero counts - fully defined, no special case.
    - TARGET ROTATION contract: the target model is derived from the
      ``target`` frame and published ONCE, at stream start, when no
      target model exists - re-invoking with a DIFFERENT target frame
      silently keeps the persisted counts (they are the stream's
      authoritative contract, like the posting stores' sidecars).
      Pass ``refresh_target=True`` to deliberately re-derive and swap
      the target model (crash-safe publish_small_table swap);
      admission from the next batch on follows the new target, the
      raw model and corpus are untouched."""
    import math

    from ..corpus_store import (
        append_corpus_rows,
        forbid_sheared_corpus,
        read_corpus,
        read_corpus_meta,
        write_corpus_meta,
    )
    from ..io import publish_small_table, recover_small_table
    from ..operators.dsir import hashed_ngram_buckets

    raw_dir = model_dir.rstrip("/") + "/raw"
    target_dir = model_dir.rstrip("/") + "/target"
    marker_dir = corpus_dir.rstrip("/") + "/_append_marker"
    spark0 = target.sparkSession
    recover_small_table(spark0, target_dir)
    if refresh_target or not _dir_exists(spark0, target_dir):
        tgt = (
            hashed_ngram_buckets(target, id_col, text_col, m, seed, algo)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("c_t"))
        )
        publish_small_table(tgt, target_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        gated = (
            batch.withColumn("lang_guess", lang_id(text_col))
            .filter(
                F.col("lang_guess").isin(*languages)
                & (F.round(quality_score(text_col), 6) >= min_quality)
                & (F.round(stopword_ratio(text_col), 6) <= max_stopword_ratio)
            )
            .drop("lang_guess")
            .localCheckpoint()
        )
        if gated.isEmpty():
            return
        recover_small_table(spark, raw_dir)
        tgt = spark.read.schema("bucket bigint, c_t bigint").parquet(target_dir)
        raw_exists = _dir_exists(spark, raw_dir)
        if raw_exists:
            raw_model = spark.read.schema(
                "bucket bigint, c_r bigint, _applied_batch bigint"
            ).parquet(raw_dir)
        else:
            raw_model = spark.createDataFrame(
                [], "bucket bigint, c_r bigint, _applied_batch bigint"
            )
        raw_model = raw_model.localCheckpoint()  # consumed 3x below
        applied = [
            r[0]
            for r in raw_model.select(F.max("_applied_batch")).collect()
        ]
        if applied and applied[0] is not None and applied[0] >= batch_id:
            # the model fold is the LAST step, so a present marker
            # means the whole batch completed (corpus append included)
            # - a crash landed between the publish swap and the
            # checkpoint commit. Re-weighting now would run under the
            # post-batch model and could admit a different set; the
            # correct replay is a no-op.
            return

        # batch features: weighting consumes them, the model fold
        # consumes them again
        feats = hashed_ngram_buckets(
            gated, id_col, text_col, m, seed, algo
        ).localCheckpoint()

        ratio = (
            tgt.join(raw_model.select("bucket", "c_r"), "bucket", "full_outer")
            .select(
                "bucket",
                F.coalesce("c_t", F.lit(0)).alias("c_t"),
                F.coalesce("c_r", F.lit(0)).alias("c_r"),
            )
        )
        totals = ratio.agg(
            F.sum("c_t").alias("tt"), F.sum("c_r").alias("tr")
        ).collect()[0]
        t_t = (totals.tt or 0) + m
        t_r = (totals.tr or 0) + m
        scored = ratio.select(
            "bucket",
            (
                F.log(F.col("c_t") + 1)
                - F.log(F.col("c_r") + 1)
                + F.lit(math.log(t_r) - math.log(t_t))
            ).alias("_lr"),
        )
        # LEFT join with the zero-count constant: the ratio table
        # covers target+raw buckets, but the batch's OWN novel buckets
        # are in neither (the raw model folds AFTER weighting) - an
        # inner join silently dropped their log((0+1)/(0+1)) +
        # log(t_r/t_t) contribution, inflating off-target weights
        # (caught by the python-replay differential)
        zero_lr = math.log(t_r) - math.log(t_t)
        weights = (
            feats.join(F.broadcast(scored), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.col("cnt") * F.coalesce("_lr", F.lit(zero_lr))
                ).alias("log_weight")
            )
        )
        # LEFT join: a gated doc with no extractable grams has no
        # feats rows; the batch operator's contract weights it 0.0
        # (neutral - other gates own empty docs), and an inner join
        # silently dropped it from admission (review finding)
        admitted = (
            gated.join(weights, id_col, "left")
            .withColumn(
                "log_weight", F.coalesce("log_weight", F.lit(0.0))
            )
            .filter(F.col("log_weight") >= min_log_weight)
        )
        # corpus layout + replay gate. The marker is a corpus-side
        # one-row sidecar published crash-safe BEFORE the append: on
        # the common path (marker < batch_id) this batch's rows
        # CANNOT be in the corpus, so no anti-join runs and the batch
        # touches the corpus only to append - the replay-idempotence
        # read is replay-only (VERDICT r14 item 2)
        recover_small_table(spark, corpus_dir)
        recover_small_table(spark, marker_dir)
        corpus_exists = _dir_exists(spark, corpus_dir)
        if corpus_exists:
            cbuckets = read_corpus_meta(spark, corpus_dir)
            if cbuckets is None:
                forbid_sheared_corpus(
                    spark, corpus_dir, "start_corpus_ingest_dsir"
                )
        else:
            cbuckets = corpus_bucket_count
        marked = None
        if _dir_exists(spark, marker_dir):
            marked = spark.read.schema("_b bigint").parquet(
                marker_dir
            ).first()
        if marked is not None and marked["_b"] >= batch_id:
            # crash replay: the marker landed, so this batch's append
            # MAY have too - suppress re-appends by id, pruned to the
            # admitted ids' buckets (equal ids share a bucket)
            admitted = admitted.localCheckpoint()
            corpus_ids = read_corpus(
                spark, corpus_dir, admitted.schema, cbuckets,
                prune_ids=admitted.select(id_col), id_col=id_col,
            ).select(id_col)
            admitted = admitted.join(corpus_ids, id_col, "left_anti")
        if not corpus_exists and cbuckets is not None:
            # sidecar BEFORE marker and rows: a crash right after
            # leaves an empty corpus that already carries its layout
            write_corpus_meta(spark, corpus_dir, cbuckets)
        publish_small_table(
            spark.createDataFrame(
                [(batch_id,)], "_b bigint"
            ),
            marker_dir,
        )
        append_corpus_rows(admitted, corpus_dir, id_col, cbuckets)

        batch_counts = feats.groupBy("bucket").agg(
            F.sum("cnt").alias("_bc")
        )
        new_raw = (
            raw_model.select("bucket", "c_r")
            .join(batch_counts, "bucket", "full_outer")
            .select(
                "bucket",
                (
                    F.coalesce("c_r", F.lit(0)) + F.coalesce("_bc", F.lit(0))
                ).alias("c_r"),
                F.lit(batch_id).cast("bigint").alias("_applied_batch"),
            )
        )
        publish_small_table(new_raw, raw_dir)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
