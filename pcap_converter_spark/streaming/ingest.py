"""Continuous corpus ingestion: a document stream deduped against the
at-rest corpus index, micro-batch by micro-batch.

The batch composition (``incremental.dedup_incremental``) answers "dedup
today's snapshot against the corpus so far"; this module answers the same
question when "today" is a stream — a crawler dropping WARC/WET segments
or JSONL dumps into a directory continuously. ``foreachBatch`` is the
right engine hook: each micro-batch runs the ordinary BATCH probe against
the index (broadcast-probe plan, index scanned not shuffled), appends the
survivors' keys, and hands the survivors to a caller sink — so a doc
ingested in batch N is deduplicated against every batch < N *and* every
earlier snapshot, with exactly the same semantics as the batch operator
(parity-tested). State lives in the INDEX, not in stream state: restarts
recover from the checkpoint + the index on disk, and the stateful-dedup
memory ceiling of ``streaming_dedup`` (one bool per key in the state
store) does not apply — the index is the state, at rest.

Within-batch duplicates: the probe only sees the index as it was when the
batch started, so two copies arriving in the SAME micro-batch both pass
the cross-snapshot check; the in-batch exact pass inside the hook drops
all but the lowest id, mirroring ``dedup_incremental``'s documented
division of labor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcap_converter_spark.operators import incremental


ADOPT = "adopt"  # sentinel: take the value the index meta recorded


def dedup_ingest_hook(
    index_path: str,
    sink,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    update: bool = True,
    normalize: str | None = ADOPT,
    prep: str | None = ADOPT,
):
    """Build the ``foreachBatch`` function: probe → in-batch exact dedup →
    ``sink(survivors_df, batch_id)`` → index append (append LAST, so a
    sink failure never leaves keys in the index for docs that were not
    delivered).

    ``normalize`` / ``prep`` keep the hook honest against a
    digest-normalized or prep-built index (ADVICE r12: the hook used to
    probe a norm=ccnet index with RAW digests — silent misses — and
    append raw keys with no signature, poisoning the index with mixed
    digest spaces). Default ``ADOPT`` reads the index meta's recorded
    prep signature on the FIRST non-empty batch and takes its ``norm=``
    field (and the full signature for appends), so the hook digests in
    the index's own digest space without the caller restating it — the
    same adopt-the-meta move as ``cli.py``'s ``_reconcile_prep``. An
    explicit value wins, but an explicit ``normalize`` that contradicts
    a recorded signature raises instead of silently mixing spaces; an
    explicit ``prep`` is verified by ``extend_corpus_index``'s
    raise-on-mismatch. Note ADOPT covers only the DIGEST space —
    if the index was built over prepared TEXT (hx=main, c4, …), the
    stream itself must deliver identically prepared text; the adopted
    ``prep`` signature passed to the append documents (and enforces)
    exactly that claim."""

    # resolved lazily on the first non-empty batch (the hook is built
    # before any SparkSession necessarily exists), then pinned: the meta
    # is immutable for the life of an index
    resolved: dict = {}

    def _resolve(spark) -> tuple[str | None, str | None]:
        if "norm" in resolved:
            return resolved["norm"], resolved["prep"]
        recorded = incremental.read_index_meta(spark, index_path).get(
            "prep"
        )
        rec_norm = (
            incremental.parse_prep_signature(recorded)["normalize"]
            if recorded
            else None
        )
        norm = rec_norm if normalize == ADOPT else normalize
        if normalize != ADOPT and recorded is not None:
            want = None if norm in (None, "none") else norm
            if want != rec_norm:
                raise ValueError(
                    f"corpus index at {index_path} records digest "
                    f"normalization {rec_norm!r} but the ingest hook was "
                    f"built with normalize={normalize!r} — the two sides "
                    "would digest different byte spaces and dedup would "
                    "silently miss"
                )
        resolved["norm"] = norm
        resolved["prep"] = recorded if prep == ADOPT else prep
        return resolved["norm"], resolved["prep"]

    def hook(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            # a quiet poll: skip the probe AND the append — an empty
            # append would still write empty part-files, feeding the
            # small-files problem compaction exists to clean up
            return
        norm, prep_sig = _resolve(batch.sparkSession)
        handles: list = []
        try:
            flags = incremental.flag_against_index(
                batch, index_path,
                text_col=text_col, id_col=id_col, threshold=threshold,
                handles=handles, normalize=norm,
            )
            keep = flags.filter(
                ~F.col("dup_exact")
                & ~F.coalesce(F.col("dup_near"), F.lit(False))
            ).select(id_col)
            novel = batch.join(keep, id_col)
            # in-batch exact dedup: keep the lowest id per digest (two
            # copies in one micro-batch both pass the index probe by
            # construction); digested in the INDEX's digest space — a
            # raw digest here would let two normalized-identical copies
            # in one batch both survive
            dig = incremental._apply_normalize(
                novel, text_col, norm
            ).select(
                F.col(id_col),
                F.sha2(F.col(text_col).cast("binary"), 256).alias("_d"),
            )
            first = dig.groupBy("_d").agg(F.min(id_col).alias(id_col))
            survivors = novel.join(
                first.select(id_col), id_col
            ).localCheckpoint(eager=True)
            sink(survivors, batch_id)
            if update:
                incremental.extend_corpus_index(
                    survivors, index_path, text_col=text_col,
                    id_col=id_col, prep=prep_sig, normalize=norm,
                )
        finally:
            # a live stream runs this hook indefinitely: per-batch persists
            # must not outlive the batch or executor storage grows forever
            for h in handles:
                h.unpersist()

    return hook


def run_dedup_ingest(
    stream_docs: DataFrame,
    index_path: str,
    sink,
    query_name: str = "dedup_ingest",
    checkpoint: str | None = None,
    **hook_kwargs,
):
    """Wire a streaming document frame through the dedup hook with
    ``availableNow`` semantics (drain what is there, then stop) — the
    shape the tests and backfill jobs use; a live deployment drops
    ``availableNow`` via its own writeStream. Returns the query object
    after it stops."""
    writer = (
        stream_docs.writeStream.queryName(query_name)
        .foreachBatch(dedup_ingest_hook(index_path, sink, **hook_kwargs))
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
