"""Micro-batch bridge: Structured Streaming → the batch medallion sinks.

``foreachBatch`` hands each micro-batch to ordinary batch code, so the
whole operator library (conform, rollups, windows, Warehouse sinks) runs
unchanged against a stream — the "mechanical readStream adaptation"
SURVEY.md §2.9 plans for. The checkpoint dir gives restart-exactly-once
at the source side; sinks are idempotent (partition overwrite / keyed
dedup), which upgrades end-to-end semantics to effectively-once — the
same invariant the reference's partition-overwrite re-runs provide
(SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from covid_data_pipeline_spark.sources.writers import Warehouse


def stream_append_to_table(
    stream_df: DataFrame,
    wh: Warehouse,
    table: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Land a stream into a warehouse table, appending per micro-batch.
    ``available_now=True`` drains the current backlog then stops — the
    streaming equivalent of one daily batch run."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        wh.append(batch_df, table, partition_by=partition_by)

    return _start(stream_df, _sink, checkpoint_dir, available_now)


def stream_append_exactly_once(
    stream_df: DataFrame,
    wh: Warehouse,
    table: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append with per-micro-batch commit markers: a replayed batch id
    (restart after a sink-side failure) is skipped instead of appended
    twice — the standard foreachBatch transactional-sink pattern, since
    a bare append is only at-least-once under replay.

    The marker is written AFTER the data lands, so a crash in between
    still replays that one batch; the marker shrinks the duplicate
    window from "every replayed batch" to that single in-flight batch.
    For strict exactly-once pair this with a keyed/dedup table or the
    partition-overwrite sink (`stream_transform_to_table`), whose
    rewrite is idempotent by construction.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_once(wh, table, batch_df, batch_id, partition_by=partition_by)

    return _start(stream_df, _sink, checkpoint_dir, available_now)


def append_once(
    wh: Warehouse,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    partition_by: Sequence[str] | None = None,
) -> bool:
    """Idempotent-by-marker append for one micro-batch: returns True if
    the batch landed, False if its id was already committed (replay).
    Exposed so the replay behavior is directly testable."""
    import os

    marker_dir = os.path.join(wh.root, "_stream_commits", *table.split("."))
    marker = os.path.join(marker_dir, f"batch-{batch_id}")
    if os.path.exists(marker):
        return False
    wh.append(batch_df, table, partition_by=partition_by)
    os.makedirs(marker_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write("")
    return True


def stream_transform_to_table(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    wh: Warehouse,
    table: str,
    checkpoint_dir: str,
    partition_by: Sequence[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Apply a batch transform to each micro-batch and dynamic-partition-
    overwrite the result — idempotent under micro-batch replay as long as
    a replayed batch covers the same partitions (true for the date-keyed
    medallion layers)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        wh.overwrite_partitions(out, table, partition_by=list(partition_by))

    return _start(stream_df, _sink, checkpoint_dir, available_now)


def _start(
    stream_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool,
) -> StreamingQuery:
    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_split_quarantine(
    stream_df: DataFrame,
    wh: Warehouse,
    good_table: str,
    quarantine_table: str,
    rules: Sequence,  # quality.Rule
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming dead-letter-queue split: every micro-batch is evaluated
    against the declarative row rules (``operators/quality.Rule``); rows
    passing ALL rules append to ``good_table``, failures land in
    ``quarantine_table`` with a ``failed_rules`` audit column — the
    streaming twin of ``read_csv_quarantine``'s contract (bad rows
    neither kill the run NOR vanish).

    Both sinks run inside ONE ``foreachBatch``, so a restart replays the
    whole batch into both tables together (no good/bad split-brain); the
    micro-batch is evaluated once per sink against the same rule
    predicates — pure projections, no extra shuffle.
    """
    import pyspark.sql.functions as F

    all_pass = None
    for r in rules:
        all_pass = r.predicate if all_pass is None else (all_pass & r.predicate)
    failed = F.concat_ws(
        ",",
        F.array_compact(
            F.array(
                *[F.when(~r.predicate, F.lit(r.name)) for r in rules]
            )
        ),
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        good = batch_df.filter(all_pass)
        bad = batch_df.filter(~F.coalesce(all_pass, F.lit(False))).withColumn(
            "failed_rules", failed
        )
        wh.append(good, good_table, partition_by=partition_by)
        wh.append(bad, quarantine_table)

    return _start(stream_df, _sink, checkpoint_dir, available_now)


def stream_maintain_aggregate(
    stream_df: DataFrame,
    mv,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream-maintained materialized aggregate: each micro-batch lands
    in the MV's snapshot base table through the commit-marker append
    (:func:`append_once` — replays are suppressed), then
    ``mv.refresh()`` folds exactly the new snapshot delta into the
    stored view (`sources/matview.py`).

    End-to-end exactly-once without a transactional sink: the append is
    idempotent by marker, and the refresh is idempotent by CURSOR — a
    replayed batch whose append was suppressed leaves the base version
    unchanged, so the refresh is a noop; a crash BETWEEN append and
    refresh just widens the next refresh's delta (the CDF covers both
    batches). The view equals a full recompute of the base table after
    every batch — the matview equality tests' invariant, now riding a
    stream.

    At 100 TB this is the continuous-rollup pattern: the stream pays
    one delta aggregation per batch (|batch groups| rows into the
    merge), never a recompute of the base table. ``mv`` is a
    ``sources.matview.MaterializedAggregate`` whose warehouse must be a
    ``SnapshotWarehouse`` (the refresh cursor lives in its manifests)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_once(
            mv.wh, mv.base_table, batch_df, batch_id, partition_by=partition_by
        )
        mv.refresh()

    return _start(stream_df, _sink, checkpoint_dir, available_now)


def stream_maintain_distinct(
    stream_df: DataFrame,
    mvd,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream-maintained exact COUNT(DISTINCT): the
    :func:`stream_maintain_aggregate` pattern over a
    ``sources.matview.MaterializedDistinct`` — commit-marker append
    into the bitmap view's append-only base, then the cursor-idempotent
    bitmap-OR refresh. Replays are doubly harmless here: the marker
    suppresses the duplicate append AND bitmap set semantics would
    absorb re-observed keys anyway. Per batch the view pays one
    |batch buckets|-sized OR-merge — the streaming answer to "live
    distinct users per segment" without approximation."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_once(mvd.wh, mvd.base_table, batch_df, batch_id)
        mvd.refresh()

    return _start(stream_df, _sink, checkpoint_dir, available_now)
