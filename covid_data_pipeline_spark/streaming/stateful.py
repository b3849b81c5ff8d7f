"""Custom stateful streaming operators (``applyInPandasWithState``).

The one stateful computation the reference performs is cumulative→delta
conversion via LAG over full history (reference
process_covid_data_mart.py:67-79 — W1 in SURVEY.md §2.5). In batch that
window re-scans all history every day; the streaming twin below keeps
only the LAST cumulative row per key as state, so each micro-batch does
O(batch) work regardless of history length — the incremental-mart
optimization SURVEY.md §4 calls for, expressed as a stream.

Arrow-batched Pandas on the grouped iterator (not row-at-a-time); state
is one row per key.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    from pyspark.sql.streaming.state import GroupState


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: drops any row whose ``keys``
    were already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``). State is bounded by the
    watermark — the at-least-once→effectively-once upgrade for event
    streams with redelivery, and the streaming face of the engine's
    exact-dedup family."""
    from covid_data_pipeline_spark.streaming.windows import ensure_event_time

    return (
        ensure_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def enrich_with_dim(stream_df: DataFrame, dim: DataFrame, on: Sequence[str], how: str = "left") -> DataFrame:
    """Stream-static join: enrich each micro-batch with a (small) static
    dimension. The dim side broadcasts per micro-batch — no stream state,
    the streaming twin of the mart's fact↔dim join (J2)."""
    from pyspark.sql import functions as F

    # bcast: delta caller dim contract (per-micro-batch dim; pre-bound big dims or pass a plain join upstream)
    return stream_df.join(F.broadcast(dim), on=list(on), how=how)


def cumulative_to_delta_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    clamp: bool = True,
) -> DataFrame:
    """Streaming cumulative→delta per key, ordered by ``order_col``.

    Emits every input row plus ``new_<v>`` delta columns; the per-key
    state is the single most-recent (order, values) row, carried across
    micro-batches. Deltas match the batch LAG formulation exactly:
    ``GREATEST(COALESCE(cur − prev, 0), 0)`` when ``clamp`` (the mart's
    clamp policy), plain ``cur − prev`` (NULL on first row) otherwise —
    the alerts' policy (SURVEY.md §7.3 keeps the two distinct).

    Late/out-of-order rows WITHIN a micro-batch are handled by sorting;
    rows arriving in a later batch with an older ``order_col`` than the
    state are a monotonicity violation and yield clamped-to-0 deltas —
    same as the reference's negative-correction behavior.
    """
    fields = {f.name: f for f in df.schema.fields}
    key_cols = list(key_cols)
    value_cols = list(value_cols)

    out_schema = StructType(
        [fields[c] for c in key_cols]
        + [fields[order_col]]
        + [fields[v] for v in value_cols]
        + [StructField(f"new_{v}", fields[v].dataType, True) for v in value_cols]
    )
    state_schema = StructType([fields[order_col]] + [fields[v] for v in value_cols])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(order_col, ignore_index=True)

        prev_vals: dict[str, object] = {}
        if state.exists:
            stored = state.get
            prev_vals = {v: stored[1 + i] for i, v in enumerate(value_cols)}

        out = batch[[order_col, *value_cols]].copy()
        for i, k in enumerate(key_cols):
            out[k] = key[i]
        for v in value_cols:
            prev = batch[v].shift(1)
            if v in prev_vals and prev_vals[v] is not None:
                prev.iloc[0] = prev_vals[v]
            delta = batch[v] - prev
            if clamp:
                delta = delta.fillna(0).clip(lower=0)
            out[f"new_{v}"] = delta

        last = batch.iloc[-1]
        state.update((last[order_col], *[last[v] for v in value_cols]))
        yield out[[*key_cols, order_col, *value_cols, *[f"new_{v}" for v in value_cols]]]

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def transform_with_state_available() -> bool:
    """Spark 4's transformWithState Python workers speak protobuf to the
    JVM state server; the container ships pyspark without protobuf, so
    the operator below constructs (plan + schema) but can only EXECUTE
    where ``google.protobuf`` is installed (any real deployment). Same
    honest-gate pattern as the Iceberg sink arm."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_running_totals(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running count/sum across micro-batches via Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    ``applyInPandasWithState``: typed state handles, per-state TTL,
    timers — backed by the same state store). Executing the returned
    stream requires protobuf — see
    :func:`transform_with_state_available`.

    Emits ONE row per key per micro-batch that touched it:
    ``(keys…, batch_rows, running_cnt, running_sum)`` — the streaming
    twin of the batch ``running_total`` window query, with O(1) state
    per key instead of a full-history re-scan per refresh. ``ttl_ms``
    expires idle keys from the store (RocksDB-friendly state hygiene at
    scale: an unbounded user population would otherwise grow state
    forever).

    State is a single (cnt, sum) pair per key; the batch's rows are
    Arrow-batched pandas, reduced before touching the store, so state
    I/O is once per key per batch regardless of row count.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_cols = list(key_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[k] for k in key_cols]
        + [
            StructField("batch_rows", LongType(), False),
            StructField("running_cnt", LongType(), False),
            StructField("running_sum", DoubleType(), True),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt long, total double", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n = 0
            s = 0.0
            for pdf in rows:
                col = pdf[value_col].dropna()
                n += len(pdf)
                s += float(col.sum()) if len(col) else 0.0
            prev = self._totals.get() if self._totals.exists() else (0, 0.0)
            cnt, total = prev[0] + n, prev[1] + s
            self._totals.update((cnt, total))
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(key_cols)},
                    "batch_rows": [n],
                    "running_cnt": [cnt],
                    "running_sum": [total],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(*key_cols).transformWithStateInPandas(
        RunningTotals(), out_schema, outputMode="Update", timeMode="None"
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join on equal ``keys`` where
    ``left_ts + lower_s < right_ts <= left_ts + upper_s``.

    The streaming twin of ``operators.rangejoin.time_range_join``: both
    sides carry watermarks and the range condition is expressed as
    event-time interval arithmetic, which is exactly what lets Spark
    bound the join state — rows age out of the state store once the
    watermark passes their match window, so state is
    O(rate x (window + watermark)) instead of unbounded. Timestamp
    columns must be uniquely named across the two streams; key columns
    are taken from the left after the join.
    """
    from covid_data_pipeline_spark.streaming.windows import ensure_event_time

    l = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{right_ts} > {left_ts} + INTERVAL {int(lower_s)} SECOND"
    ) & F.expr(f"{right_ts} <= {left_ts} + INTERVAL {int(upper_s)} SECOND")
    for k in keys:
        cond = cond & (l[k] == r[k])
    out = l.join(r, cond)
    for k in keys:
        out = out.drop(r[k])
    return out


def stream_funnel_stage_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/funnel.py::funnel_stage_times``:
    per-user first-completion times for an ordered stage sequence,
    maintained across micro-batches with one k-timestamp state row per
    user (``applyInPandasWithState``).

    Each micro-batch is pre-filtered to stage events, sorted by
    ``(ts, type)``, and folded with the SAME strict-``>`` (and optional
    ``max_gap``) step bounds as the batch operator, starting from the
    stored stage times. Emits the user's current stage-time row
    whenever a batch advances it (Update mode — the memory/console twin
    of a keyed upsert sink).

    Parity contract (proven in tests/test_streaming.py): when events
    arrive in event-time order across batches, the final state equals
    the batch fold exactly. Out-of-order arrivals refine monotonically
    — a stage-0 event OLDER than the committed t0 cannot rewind it
    (that would require reprocessing later stages); same
    at-arrival-order caveat as the delta operator above.

    Scale: state is k timestamps per user (bounded, RocksDB-friendly);
    per-batch work is O(stage events in batch) after the filter, which
    at 100 TB/day is the small funnel-typed fraction of the stream.
    """
    stages = list(stages)
    fields = {f.name: f for f in df.schema.fields}
    ts_field = fields[ts_col]
    t_cols = [f"t{i}" for i in range(len(stages))]
    out_schema = StructType(
        [fields[user_col]]
        + [StructField(t, ts_field.dataType, True) for t in t_cols]
    )
    state_schema = StructType(
        [StructField(t, ts_field.dataType, True) for t in t_cols]
    )
    gap = pd.Timedelta(max_gap) if max_gap is not None else None

    ev = df.filter(
        F.col(type_col).isin(stages) & F.col(ts_col).isNotNull()
    ).select(user_col, ts_col, type_col)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, type_col], ignore_index=True)
        times: list = (
            list(state.get) if state.exists else [None] * len(stages)
        )
        changed = False
        for ts, tp in zip(batch[ts_col], batch[type_col]):
            if pd.isna(ts):
                continue
            i = stages.index(tp)
            if times[i] is not None:
                continue
            if i > 0:
                prev = times[i - 1]
                if prev is None or not ts > prev:
                    continue
                if gap is not None and ts > prev + gap:
                    continue
            times[i] = ts
            changed = True
        if changed:
            state.update(tuple(times))
            yield pd.DataFrame(
                {user_col: [key[0]], **{t: [times[i]] for i, t in enumerate(t_cols)}}
            )

    return ev.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_heavy_hitters(
    df: DataFrame,
    key_cols: Sequence[str],
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Streaming per-key heavy hitters: a Misra–Gries summary of at most
    ``k`` counters per key, maintained across micro-batches
    (``applyInPandasWithState``) — the streaming twin of
    ``operators/heavyhitters.py``'s per-partition nomination pass.

    MG summaries are MERGEABLE (Agarwal et al., "Mergeable summaries"):
    fold the batch's item counts into the stored counters, and when
    more than ``k`` survive, subtract the (k+1)-th largest count from
    all and drop the non-positive — the classic guarantee transfers
    across batches, so any item whose true stream frequency exceeds
    ``n/(k+1)`` is ALWAYS among the emitted candidates (asserted
    against the batch exact operator in tests). Counts are
    underestimates (true ≥ mg_count ≥ true − n/(k+1)); for exact
    values, recount the candidate set against the corpus — the same
    two-pass pattern as the batch operator.

    Emits each key's current summary after every batch with a
    monotonically increasing ``n_seen`` (rows-processed watermark), so
    a keyed upsert sink always holds the latest summary. State is
    ≤ k (item, count) pairs per key — constant-size, RocksDB-friendly;
    per-batch work is one value_counts + an O(k + distinct-in-batch)
    merge."""
    key_cols = list(key_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in key_cols]
        + [
            StructField("item", StringType(), False),
            StructField("mg_count", LongType(), False),
            StructField("n_seen", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("items", ArrayType(StringType()), True),
            StructField("counts", ArrayType(LongType()), True),
            StructField("n_seen", LongType(), True),
        ]
    )

    src = df.select(*key_cols, F.col(item_col).cast("string").alias("__item"))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            summary = dict(zip(list(items), list(counts)))
        else:
            summary, n_seen = {}, 0
        for pdf in pdfs:
            vc = pdf["__item"].dropna().value_counts()
            n_seen += int(vc.sum())
            for item, c in vc.items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > k:
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {
                    i: c - cut for i, c in summary.items() if c - cut > 0
                }
        state.update((list(summary), [int(c) for c in summary.values()], n_seen))
        if not summary:
            return
        out = pd.DataFrame(
            {
                "item": list(summary),
                "mg_count": [int(c) for c in summary.values()],
                "n_seen": n_seen,
            }
        )
        for c, v in zip(key_cols, key):
            out[c] = v
        yield out[[*key_cols, "item", "mg_count", "n_seen"]]

    return src.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_srm_guard(
    df: DataFrame,
    experiment_cols: Sequence[str],
    treat_col: str,
    ratio_treat: int = 1,
    ratio_ctrl: int = 1,
) -> DataFrame:
    """Streaming sample-ratio-mismatch guard: per-experiment
    treatment/control assignment counters maintained across
    micro-batches, re-scored after every batch with the exact-integer
    chi-square of ``operators/experiment.py::srm_check`` — so a broken
    ramp (bot filter eating one arm, redirect bug, logging loss) fires
    DURING the rollout, not in the post-hoc readout.

    Counts are exact and batch-boundary independent (addition commutes),
    so the emitted statistic after the stream drains equals the batch
    ``srm_check`` on the same rows — asserted in tests. State is two
    BIGINTs per experiment; Update-mode emissions carry ``n_seen`` so a
    keyed upsert sink always shows the live verdict."""
    experiment_cols = list(experiment_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in experiment_cols]
        + [
            StructField("n_treat", LongType(), False),
            StructField("n_ctrl", LongType(), False),
            StructField("chi2_milli", LongType(), False),
            StructField("srm_detected", BooleanType(), False),
            StructField("n_seen", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("nt", LongType(), True),
            StructField("nc", LongType(), True),
        ]
    )

    src = df.select(
        *experiment_cols, F.col(treat_col).cast("boolean").alias("__t")
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        nt, nc = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            # NULL assignments are dropped on BOTH sides (matching the
            # batch srm_check, where when(t)/when(~t) skip NULLs); the
            # astype(bool) matters — a batch containing any NULL arrives
            # as an object-dtype column, where `~` is integer bitwise
            # negation (~True == -2), not logical NOT
            t = pdf["__t"].dropna().astype(bool)
            nt += int(t.sum())
            nc += int((~t).sum())
        state.update((nt, nc))
        n = nt + nc
        if n == 0:
            return
        diff = nt * ratio_ctrl - nc * ratio_treat
        num = diff * diff * 1000
        den = n * ratio_treat * ratio_ctrl
        chi2_milli = num // den
        out = pd.DataFrame(
            {
                "n_treat": [nt],
                "n_ctrl": [nc],
                "chi2_milli": [chi2_milli],
                "srm_detected": [chi2_milli > 10_828],
                "n_seen": [n],
            }
        )
        for c, v in zip(experiment_cols, key):
            out[c] = v
        yield out[
            [*experiment_cols, "n_treat", "n_ctrl", "chi2_milli",
             "srm_detected", "n_seen"]
        ]

    return src.groupBy(*experiment_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_cusum(
    df: DataFrame,
    mu: float,
    sigma: float,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Streaming twin of ``operators/temporal.py::cusum_changepoints``
    against a pre-calibrated regime (μ, σ fitted batch-side on history —
    the standard CUSUM deployment): per key, the daily event count
    accumulates in state, and when a later day arrives the completed
    day folds through the identical two-sided max(0, ·) recurrence and
    emits its (day, S⁺, S⁻, breach) row.

    State per key is three scalars plus ONE open day's counter —
    micro-batches do O(batch) work and history length is irrelevant.
    Day closure happens when a strictly later day is observed for that
    key (day-ordered arrival per key; a production feed with
    cross-batch disorder would put a watermark-sized reorder buffer in
    front — same contract as `cumulative_to_delta_stream`). The
    recurrence arithmetic runs on the SAME IEEE doubles as the batch
    fold and the final ROUND happens JVM-side after emission, so
    drained-stream rows equal the batch operator's rows for every
    closed day (asserted in tests).
    """
    key_cols = list(key_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in key_cols]
        + [
            StructField("day", StringType(), False),
            StructField("sp", DoubleType(), False),
            StructField("sn", DoubleType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("sp", DoubleType(), True),
            StructField("sn", DoubleType(), True),
            StructField("open_day", StringType(), True),
            StructField("open_cnt", LongType(), True),
        ]
    )
    src = df.where(F.col(ts_col).isNotNull()).select(
        *key_cols, F.to_date(F.col(ts_col)).cast("string").alias("__day")
    )
    m, sd, k = float(mu), float(sigma), float(k_sigma)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        sp, sn, open_day, open_cnt = (
            state.get if state.exists else (0.0, 0.0, None, 0)
        )
        closed: list[tuple[str, float, float]] = []

        def close(day: str, cnt: int) -> None:
            nonlocal sp, sn
            # bit-identical to the batch fold's update expressions
            sp = max(0.0, sp + (float(cnt) - m - k * sd))
            sn = max(0.0, sn + (m - float(cnt) - k * sd))
            closed.append((day, sp, sn))

        for pdf in pdfs:
            counts = pdf["__day"].value_counts()
            for day in sorted(counts.index):
                if open_day is None:
                    open_day, open_cnt = day, 0
                elif day > open_day:
                    close(open_day, open_cnt)
                    open_day, open_cnt = day, 0
                elif day < open_day:
                    # late day after closure: refuse silently-wrong state
                    raise ValueError(
                        f"day-ordered arrival violated: {day} after "
                        f"{open_day} closed (key={key})"
                    )
                open_cnt += int(counts[day])
        state.update((sp, sn, open_day, open_cnt))
        if closed:
            out = pd.DataFrame(closed, columns=["day", "sp", "sn"])
            for c, v in zip(key_cols, key):
                out[c] = v
            yield out[[*key_cols, "day", "sp", "sn"]]

    raw = src.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    h = F.lit(float(h_sigma))
    return raw.select(
        *key_cols,
        F.col("day").cast("date").alias("day"),
        F.round(F.col("sp"), 4).alias("cusum_pos"),
        F.round(F.col("sn"), 4).alias("cusum_neg"),
        ((F.col("sp") > h * F.lit(sd)) | (F.col("sn") > h * F.lit(sd))).alias(
            "breach"
        ),
    )


def stream_holt_winters(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.5,
    gamma: float = 0.5,
) -> DataFrame:
    """Streaming twin of ``operators/temporal.py::holt_winters_seasonal``:
    per key, daily counts accumulate in state; each CLOSED day folds
    through the identical additive Holt-Winters recurrence and emits
    its (day, level, trend, forecast_1) row.

    Warmup: the first ``2·period`` closed days buffer in state (the
    batch init needs two full seasons — ℓ₀/b₀ from exact integer season
    sums, s_i from season one); on the 2m-th closure the model
    initializes and REPLAYS days m+1..2m through the fold (the batch
    operator folds those too), emitting them in order. Steady state is
    O(period) doubles per key — history length is irrelevant.

    Day-ordered arrival per key is required (same contract and same
    loud failure as :func:`stream_cusum`). The fold runs the same IEEE
    double expressions as the batch ``F.aggregate`` step, so for every
    closed day the emitted level/trend equal a batch fit over exactly
    the closed-day prefix — asserted in tests.
    """
    key_cols = list(key_cols)
    m = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in key_cols]
        + [
            StructField("day", StringType(), False),
            StructField("lvl", DoubleType(), False),
            StructField("trd", DoubleType(), False),
            StructField("fc1", DoubleType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("lvl", DoubleType(), True),
            StructField("trd", DoubleType(), True),
            StructField("seas", ArrayType(DoubleType()), True),
            StructField("buf_days", ArrayType(StringType()), True),
            StructField("buf_cnts", ArrayType(LongType()), True),
            StructField("open_day", StringType(), True),
            StructField("open_cnt", LongType(), True),
        ]
    )
    src = df.where(F.col(ts_col).isNotNull()).select(
        *key_cols, F.to_date(F.col(ts_col)).cast("string").alias("__day")
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lvl, trd, seas, buf_days, buf_cnts, open_day, open_cnt = state.get
            seas = list(seas) if seas is not None else None
            buf_days, buf_cnts = list(buf_days), list(buf_cnts)
        else:
            lvl, trd, seas = 0.0, 0.0, None
            buf_days, buf_cnts, open_day, open_cnt = [], [], None, 0
        emitted: list[tuple[str, float, float, float]] = []

        def fold(day: str, cnt: int) -> None:
            # bit-identical to the batch F.aggregate step expressions
            nonlocal lvl, trd, seas
            y = float(cnt)
            s_m = seas[0]
            nl = a * (y - s_m) + (1.0 - a) * (lvl + trd)
            nt = b * (nl - lvl) + (1.0 - b) * trd
            ns = g * (y - nl) + (1.0 - g) * s_m
            seas = seas[1:] + [ns]
            lvl, trd = nl, nt
            emitted.append((day, lvl, trd, lvl + trd + seas[0]))

        def close(day: str, cnt: int) -> None:
            nonlocal lvl, trd, seas, buf_days, buf_cnts
            if seas is None:
                buf_days.append(day)
                buf_cnts.append(cnt)
                if len(buf_cnts) == 2 * m:
                    s1 = sum(buf_cnts[:m])
                    s2 = sum(buf_cnts[m:])
                    lvl = float(s1) / float(m)
                    trd = float(s2 - s1) / float(m * m)
                    seas = [float(y) - lvl for y in buf_cnts[:m]]
                    for d, c in zip(buf_days[m:], buf_cnts[m:]):
                        fold(d, c)
                    buf_days, buf_cnts = [], []
            else:
                fold(day, cnt)

        for pdf in pdfs:
            counts = pdf["__day"].value_counts()
            for day in sorted(counts.index):
                if open_day is None:
                    open_day, open_cnt = day, 0
                elif day > open_day:
                    close(open_day, open_cnt)
                    open_day, open_cnt = day, 0
                elif day < open_day:
                    raise ValueError(
                        f"day-ordered arrival violated: {day} after "
                        f"{open_day} closed (key={key})"
                    )
                open_cnt += int(counts[day])
        state.update(
            (lvl, trd, seas, buf_days, buf_cnts, open_day, open_cnt)
        )
        if emitted:
            out = pd.DataFrame(
                emitted, columns=["day", "lvl", "trd", "fc1"]
            )
            for c, v in zip(key_cols, key):
                out[c] = v
            yield out[[*key_cols, "day", "lvl", "trd", "fc1"]]

    raw = src.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return raw.select(
        *key_cols,
        F.col("day").cast("date").alias("day"),
        F.round(F.col("lvl"), 4).alias("level"),
        F.round(F.col("trd"), 4).alias("trend"),
        F.round(F.col("fc1"), 4).alias("forecast_1"),
    )


def stream_repair_monotone(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type",),
    day_col: str = "day",
    cum_col: str = "reported",
) -> DataFrame:
    """Streaming twin of ``operators/temporal.py::
    repair_cumulative_monotone``: a feed of per-key CUMULATIVE counter
    readings (one per day, day-ordered per key — same arrival contract
    and loud violation as :func:`stream_cusum`) is repaired live with a
    running maximum held in state (ONE BIGINT per key), emitting
    ``(day, reported, repaired, was_corrected)`` rows as they arrive.

    max() is associative and the arrival order is the batch fold
    order, so drained-stream rows EQUAL the batch operator's rows on
    the same input — asserted in tests. This is the live version of
    the JHU downward-correction fix: the dashboard never shows a
    cumulative series going backwards, and the audit flag preserves
    where the upstream corrected."""
    key_cols = list(key_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in key_cols]
        + [
            StructField("day", StringType(), False),
            StructField("reported", LongType(), False),
            StructField("repaired", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("cur_max", LongType(), True),
            StructField("last_day", StringType(), True),
        ]
    )
    src = df.select(
        *key_cols,
        F.col(day_col).cast("string").alias("__day"),
        F.col(cum_col).cast("long").alias("__rep"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        cur_max, last_day = state.get if state.exists else (None, None)
        out: list[tuple[str, int, int]] = []
        for pdf in pdfs:
            for day, rep in sorted(
                zip(pdf["__day"], pdf["__rep"]), key=lambda t: t[0]
            ):
                if last_day is not None and day <= last_day:
                    raise ValueError(
                        f"day-ordered arrival violated: {day} after "
                        f"{last_day} (key={key})"
                    )
                rep = int(rep)
                cur_max = rep if cur_max is None else max(cur_max, rep)
                out.append((day, rep, cur_max))
                last_day = day
        state.update((cur_max, last_day))
        if out:
            o = pd.DataFrame(out, columns=["day", "reported", "repaired"])
            for c, v in zip(key_cols, key):
                o[c] = v
            yield o[[*key_cols, "day", "reported", "repaired"]]

    raw = src.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return raw.select(
        *key_cols,
        F.col("day").cast("date").alias("day"),
        "reported",
        "repaired",
        (F.col("repaired") != F.col("reported")).alias("was_corrected"),
    )


def stream_markov_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming first-order Markov transition counting — the twin of
    the batch ``events_markov_transitions`` estimator. Per-user state
    is the LAST seen event type plus the user's cumulative transition
    counts (bounded by |types|^2 entries — constant-size, RocksDB-
    friendly); each micro-batch folds its rows in (ts, id) order and
    re-emits the user's full current counts with a monotone
    ``n_trans`` watermark, so a keyed upsert sink (user, prev, next)
    always holds the latest counts and the corpus transition matrix is
    one SUM over users away — exactly the relation the batch
    estimator's checkpointed (user, prev, next, c) rollup holds.

    On closed (fully ingested, per-user ordered) data the summed
    counts equal the batch LAG estimator exactly — asserted in
    tests/test_streaming.py; cross-batch continuity comes from the
    carried last-type state, so a transition spanning a micro-batch
    boundary is never lost."""
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [
            fields[user_col],
            StructField("prev_type", StringType(), False),
            StructField("next_type", StringType(), False),
            StructField("c", LongType(), False),
            StructField("n_trans", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_type", StringType(), True),
            StructField("prevs", ArrayType(StringType()), True),
            StructField("nexts", ArrayType(StringType()), True),
            StructField("counts", ArrayType(LongType()), True),
            StructField("n_trans", LongType(), True),
        ]
    )
    src = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).cast("string").alias("__t"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last, prevs, nexts, counts, n_trans = state.get
            table = {
                (p, x): int(c)
                for p, x, c in zip(list(prevs), list(nexts), list(counts))
            }
        else:
            last, table, n_trans = None, {}, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["__ts", "__id"])
            for t in pdf["__t"]:
                if last is not None:
                    table[(last, t)] = table.get((last, t), 0) + 1
                    n_trans += 1
                last = t
        state.update(
            (
                last,
                [p for p, _ in table],
                [x for _, x in table],
                [int(c) for c in table.values()],
                int(n_trans),
            )
        )
        if not table:
            return
        out = pd.DataFrame(
            {
                "prev_type": [p for p, _ in table],
                "next_type": [x for _, x in table],
                "c": [int(c) for c in table.values()],
                "n_trans": int(n_trans),
            }
        )
        out[user_col] = key[0]
        yield out[[user_col, "prev_type", "next_type", "c", "n_trans"]]

    return src.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_mann_whitney(
    df: DataFrame,
    experiment_cols: Sequence[str],
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming Mann–Whitney rank-sum monitor: per experiment, the
    exact integer U statistic re-scored after every micro-batch — the
    nonparametric live companion to :func:`stream_srm_guard` (is the
    treated VALUE DISTRIBUTION shifting, not just the assignment
    ratio?) and the streaming twin of
    `operators/experiment.py::mann_whitney_u`.

    State is the value-compressed histogram per arm — three parallel
    arrays (value, n_treat_at_value, n_ctrl_at_value) — so state size
    is |distinct values|, never row count: integer metrics (cents,
    counts, scores) keep it bounded by the value domain; bucket
    continuous metrics upstream. Counts merge by addition, so the
    drained stream's final emission is bit-identical to the batch
    operator on the same rows (asserted in tests). Emissions carry ONLY
    exact integers (u2 = doubled U, arm sizes) — AUC/z are one display
    division away and belong to the batch readout's float policy.
    """
    experiment_cols = list(experiment_cols)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in experiment_cols]
        + [
            StructField("n_treat", LongType(), False),
            StructField("n_ctrl", LongType(), False),
            StructField("u2_treat", LongType(), False),
            StructField("n_values", LongType(), False),
            StructField("n_seen", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("vals", ArrayType(LongType()), True),
            StructField("tvs", ArrayType(LongType()), True),
            StructField("cvs", ArrayType(LongType()), True),
        ]
    )
    src = df.select(
        *experiment_cols,
        F.col(value_col).cast("long").alias("__v"),
        F.col(treat_col).cast("boolean").alias("__t"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, tvs, cvs = state.get
            hist = {int(v): [int(t), int(c)] for v, t, c in zip(vals, tvs, cvs)}
        else:
            hist = {}
        for pdf in pdfs:
            sub = pdf[["__v", "__t"]].dropna()
            for v, t in zip(sub["__v"].astype(int), sub["__t"].astype(bool)):
                cell = hist.setdefault(int(v), [0, 0])
                cell[0 if t else 1] += 1
        if not hist:
            return
        vals = sorted(hist)
        state.update((
            vals,
            [hist[v][0] for v in vals],
            [hist[v][1] for v in vals],
        ))
        # exact integer U over the value-compressed domain (same
        # construction as the batch operator: 2*sum(tv*cum_c_less) +
        # sum(tv*cv), all Python bigints)
        u2 = 0
        cum_c = 0
        nt = nc = 0
        for v in vals:
            tv, cv = hist[v]
            u2 += 2 * tv * cum_c + tv * cv
            cum_c += cv
            nt += tv
            nc += cv
        out = pd.DataFrame(
            {
                "n_treat": [nt],
                "n_ctrl": [nc],
                "u2_treat": [u2],
                "n_values": [len(vals)],
                "n_seen": [nt + nc],
            }
        )
        for c, v in zip(experiment_cols, key):
            out[c] = v
        yield out[
            [*experiment_cols, "n_treat", "n_ctrl", "u2_treat",
             "n_values", "n_seen"]
        ]

    return src.groupBy(*experiment_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    p: int = 12,
) -> DataFrame:
    """Streaming portable-HLL distinct monitor: per group, the sketch
    registers maintained as state and re-emitted after every
    micro-batch — the live companion to batch
    `operators/sketches.py::hll_registers`/`hll_estimate` and the
    approximate counterpart of ``stream_maintain_distinct`` (exact
    bitmaps) when per-key exactness isn't worth the state.

    Hashing/bucket/rho run JVM-side BEFORE the stateful map with the
    SAME expressions as the batch operator, so the stream and batch
    sketches agree by construction; state is the register dict
    (<= 2^p entries per group — fixed size forever, the whole point of
    HLL under unbounded streams); registers merge by MAX so replays
    and splits across micro-batches cannot change the drained result.

    Emissions carry ONLY exact integers (repo streaming float policy —
    the estimate's one division belongs to the batch readout):
    ``pres`` (registers present), the harmonic sum
    ``S = sum 2^(61-rho) + z*2^61`` split as ``(s_hi, s_lo)`` at 2^62
    (S can exceed int64), and ``n_seen``. The drained stream's final
    (pres, s_hi, s_lo) is bit-identical to the batch sketch's —
    asserted in tests."""
    from covid_data_pipeline_spark.operators.sketches import (
        _rho,
        _TWO61,
    )
    from covid_data_pipeline_spark.operators.features import (
        portable_token_hash,
    )

    group_cols = list(group_cols)
    w = 60 - p
    m = 1 << p
    mask = (1 << w) - 1
    h = portable_token_hash(F.col(key_col).cast("string"))
    src = df.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.shiftright(h, w).alias("__bucket"),
        _rho(h.bitwiseAND(F.lit(mask)), w).alias("__rho"),
    )
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("pres", LongType(), False),
            StructField("s_hi", LongType(), False),
            StructField("s_lo", LongType(), False),
            StructField("n_seen", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("buckets", ArrayType(LongType()), True),
            StructField("rhos", ArrayType(LongType()), True),
            StructField("seen", LongType(), True),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buckets, rhos, seen = state.get
            reg = dict(zip((int(b) for b in buckets),
                           (int(r) for r in rhos)))
            seen = int(seen)
        else:
            reg, seen = {}, 0
        n_new = 0
        for pdf in pdfs:
            sub = pdf[["__bucket", "__rho"]].dropna()
            n_new += len(sub)
            for b, r in zip(sub["__bucket"].astype(int),
                            sub["__rho"].astype(int)):
                if r > reg.get(b, 0):
                    reg[b] = r
        if not reg:
            return
        seen += n_new
        bs = sorted(reg)
        state.update((bs, [reg[b] for b in bs], seen))
        s = sum(1 << (61 - r) for r in reg.values())
        s += (m - len(reg)) * _TWO61
        out = pd.DataFrame(
            {
                "pres": [len(reg)],
                "s_hi": [s >> 62],
                "s_lo": [s & ((1 << 62) - 1)],
                "n_seen": [seen],
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[[*group_cols, "pres", "s_hi", "s_lo", "n_seen"]]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_interval_union(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Streaming interval union: the live twin of
    `operators/intervals.py::merge_intervals`. Per key, the merged
    island list is the state; every micro-batch folds its intervals in
    (closed-interval semantics — overlap OR touch coalesces) and
    re-emits the key's full current island set tagged with a
    monotonically increasing ``seq``, so a reader takes each key's
    max-seq rows as the current unions.

    Batching-invariant by construction: interval union is an
    associative, commutative fold, so any split of the input across
    micro-batches (and any arrival order — no watermark or event-time
    ordering required) drains to the same islands as the batch sweep;
    asserted against ``merge_intervals`` in tests.

    State is the key's island list (starts/ends/counts arrays) —
    bounded by the key's island count, the interval-domain analogue of
    the Mann-Whitney monitor's per-value histogram. A production
    deployment with event-time watermarks would additionally finalize
    (emit-and-evict) islands that end before the watermark, capping
    state at the active horizon; island identity here is (start, end),
    so numbering is assigned by rank at read time, not carried in
    state."""
    group_cols = list(group_cols)
    src = df.select(
        *group_cols,
        F.col(start_col).cast("bigint").alias("__s"),
        F.col(end_col).cast("bigint").alias("__e"),
    )
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("island_no", LongType(), False),
            StructField(start_col, LongType(), False),
            StructField(end_col, LongType(), False),
            StructField("n_source", LongType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType()), True),
            StructField("ends", ArrayType(LongType()), True),
            StructField("counts", ArrayType(LongType()), True),
            StructField("seq", LongType(), True),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            starts, ends, counts, seq = state.get
            islands = [
                [int(s), int(e), int(c)]
                for s, e, c in zip(starts, ends, counts)
            ]
            seq = int(seq)
        else:
            islands, seq = [], 0
        pending = []
        for pdf in pdfs:
            sub = pdf[["__s", "__e"]].dropna()
            pending.extend(
                [int(s), int(e), 1]
                for s, e in zip(sub["__s"], sub["__e"])
            )
        if not pending:
            return
        # associative fold: existing islands are just weighted intervals
        merged: list[list[int]] = []
        for s, e, c in sorted(islands + pending):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])
        seq += 1
        state.update(
            (
                [i[0] for i in merged],
                [i[1] for i in merged],
                [i[2] for i in merged],
                seq,
            )
        )
        out = pd.DataFrame(
            {
                "island_no": pd.array(
                    range(1, len(merged) + 1), dtype="Int64"
                ),
                start_col: pd.array([i[0] for i in merged], dtype="Int64"),
                end_col: pd.array([i[1] for i in merged], dtype="Int64"),
                "n_source": pd.array([i[2] for i in merged], dtype="Int64"),
                "seq": pd.array([seq] * len(merged), dtype="Int64"),
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[
            [*group_cols, "island_no", start_col, end_col, "n_source", "seq"]
        ]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_ams_f2(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    depth: int = 16,
) -> DataFrame:
    """Streaming AMS tug-of-war F2 monitor: the live twin of
    `operators/sketches.py::ams_f2_sketch`. State per group is the
    ``depth`` signed BIGINT accumulators — the most mergeable sketch in
    the toolbox (plain addition), so micro-batch splits, replays of
    disjoint slices, and arrival order can't change the drained state.

    The ±1 signs are computed JVM-side BEFORE the stateful map with the
    SAME salted md5 expressions as the batch operator, so stream and
    batch agree by construction. Emissions follow the repo streaming
    float policy — exact integers only: the signed sums themselves
    (as an ordered array), ``n_seen``, and ``seq``; squaring/averaging
    into the F2 estimate is the batch readout's one float step and
    happens OUTSIDE the stream."""
    from covid_data_pipeline_spark.operators.features import (
        portable_token_hash,
    )

    group_cols = list(group_cols)
    signs = [
        (
            F.lit(1)
            - F.lit(2)
            * (
                portable_token_hash(
                    F.concat(
                        F.lit(f"ams{j}:"),
                        F.col(key_col).cast("string"),
                    )
                )
                % 2
            )
        ).cast("bigint").alias(f"__g{j}")
        for j in range(depth)
    ]
    src = df.where(F.col(key_col).isNotNull()).select(*group_cols, *signs)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("s", ArrayType(LongType()), False),
            StructField("n_seen", LongType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("s", ArrayType(LongType()), True),
            StructField("n", LongType(), True),
            StructField("seq", LongType(), True),
        ]
    )
    cols = [f"__g{j}" for j in range(depth)]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s, n, seq = state.get
            s = [int(v) for v in s]
            n, seq = int(n), int(seq)
        else:
            s, n, seq = [0] * depth, 0, 0
        n_new = 0
        for pdf in pdfs:
            sub = pdf[cols]
            n_new += len(sub)
            for j, c in enumerate(cols):
                s[j] += int(sub[c].sum()) if len(sub) else 0
        if n_new == 0:
            return
        n += n_new
        seq += 1
        state.update((s, n, seq))
        out = pd.DataFrame(
            {
                "s": [s],
                "n_seen": pd.array([n], dtype="Int64"),
                "seq": pd.array([seq], dtype="Int64"),
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[[*group_cols, "s", "n_seen", "seq"]]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_cm_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming count-min sketch: the live twin of
    `operators/sketches.py::cm_sketch`. State per group is the flat
    ``depth x width`` integer counter matrix — like the AMS
    accumulators, counters merge by plain addition, so micro-batch
    splits, replays of disjoint slices, and arrival order cannot
    change the drained state; any point-frequency or join-size
    readout (`cm_lookup` / `cm_inner_product`) consumes the emitted
    counters directly.

    Slots are computed JVM-side BEFORE the stateful map with the SAME
    salted md5 expressions as the batch operator (``md5('j:key')``
    prefix mod width), so stream and batch agree by construction.
    Emissions are exact integers only: the counter matrix (row-major
    ``j * width + slot``), ``n_seen``, and ``seq``."""
    from covid_data_pipeline_spark.operators.features import (
        portable_token_hash,
    )

    group_cols = list(group_cols)
    slots = [
        F.pmod(
            portable_token_hash(
                F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))
            ),
            F.lit(width),
        ).cast("long").alias(f"__s{j}")
        for j in range(depth)
    ]
    src = df.where(F.col(key_col).isNotNull()).select(*group_cols, *slots)
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("counters", ArrayType(LongType()), False),
            StructField("n_seen", LongType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("counters", ArrayType(LongType()), True),
            StructField("n", LongType(), True),
            StructField("seq", LongType(), True),
        ]
    )
    cols = [f"__s{j}" for j in range(depth)]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters, n, seq = state.get
            counters = [int(v) for v in counters]
            n, seq = int(n), int(seq)
        else:
            counters, n, seq = [0] * (depth * width), 0, 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            for j, c in enumerate(cols):
                for slot, cnt in pdf[c].value_counts().items():
                    counters[j * width + int(slot)] += int(cnt)
        if n_new == 0:
            return
        n += n_new
        seq += 1
        state.update((counters, n, seq))
        out = pd.DataFrame(
            {
                "counters": [counters],
                "n_seen": pd.array([n], dtype="Int64"),
                "seq": pd.array([seq], dtype="Int64"),
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[[*group_cols, "counters", "n_seen", "seq"]]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_psi(
    df: DataFrame,
    group_cols: Sequence[str],
    bin_col: str,
    ref_counts: "dict[object, Sequence[int]]",
    bins: int = 10,
) -> DataFrame:
    """Streaming population-stability-index drift monitor: the live
    twin of the batch `events_psi_drift` formula, against REFERENCE
    bin counts fixed at model-tuning time (the production monitoring
    setup: decile boundaries + reference histogram are fit offline;
    the stream only re-bins and counts).

    Callers bin upstream (pure projection — any boundary rule
    composes); ``bin_col`` holds 1-based integer bins in [1, bins].
    ``ref_counts`` maps the group key (the single group column's
    value, or a tuple for composite keys) to that group's reference
    histogram. State per group is the additive current-count vector —
    micro-batch splits, replays of disjoint slices, and arrival order
    cannot change the drained state. Each update emits the counts and
    the PSI recomputed over ALL data so far, with the IDENTICAL
    term arithmetic as the batch oracle (+0.5 smoothing, ln of one
    IEEE ratio, nano-unit integer scale, 0.1 threshold compared in
    BIGINT): ``psi_nano`` and ``drifted``. Per-term rounding is
    explicit HALF-AWAY-FROM-ZERO (ADVICE r9: Python ``round`` is
    half-to-even while SQL ROUND is half-away, so a term landing
    exactly on a .5 nano boundary would have diverged; each PSI term
    is >= 0 by construction — (p-q) and ln(p/q) share a sign — but
    the rounding is sign-safe regardless). Groups without a reference
    histogram are dropped (nothing to compare against)."""
    import math

    group_cols = list(group_cols)
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    ref = {
        (k if isinstance(k, tuple) else (k,)): [int(c) for c in v]
        for k, v in ref_counts.items()
    }
    if any(len(v) != bins for v in ref.values()):
        raise ValueError("every ref_counts entry must have `bins` counts")
    src = df.where(
        F.col(bin_col).isNotNull()
        & (F.col(bin_col) >= 1)
        & (F.col(bin_col) <= bins)
    ).select(*group_cols, F.col(bin_col).cast("long").alias("__bin"))
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("counts", ArrayType(LongType()), False),
            StructField("n_seen", LongType(), False),
            StructField("psi_nano", LongType(), False),
            StructField("drifted", BooleanType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("counts", ArrayType(LongType()), True),
            StructField("seq", LongType(), True),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        rc = ref.get(tuple(key))
        if rc is None:
            return
        if state.exists:
            counts, seq = state.get
            counts = [int(v) for v in counts]
            seq = int(seq)
        else:
            counts, seq = [0] * bins, 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            for b, cnt in pdf["__bin"].value_counts().items():
                counts[int(b) - 1] += int(cnt)
        if n_new == 0:
            return
        seq += 1
        state.update((counts, seq))
        nr = sum(rc)
        nc = sum(counts)
        psi = 0
        for r, c in zip(rc, counts):
            p = (r + 0.5) / (nr + bins * 0.5)
            q = (c + 0.5) / (nc + bins * 0.5)
            t = (p - q) * math.log(p / q) * 1e9
            # SQL ROUND semantics: half away from zero, not banker's
            psi += int(math.floor(t + 0.5) if t >= 0 else math.ceil(t - 0.5))
        out = pd.DataFrame(
            {
                "counts": [counts],
                "n_seen": pd.array([nc], dtype="Int64"),
                "psi_nano": pd.array([psi], dtype="Int64"),
                "drifted": [psi > 100_000_000],
                "seq": pd.array([seq], dtype="Int64"),
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[[*group_cols, "counts", "n_seen", "psi_nano",
                   "drifted", "seq"]]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_wasserstein(
    df: DataFrame,
    group_cols: Sequence[str],
    bin_col: str,
    ref_counts: "dict[object, Sequence[int]]",
    bins: int = 10,
    drift_micro: int = 500_000,
) -> DataFrame:
    """Streaming 1-D Wasserstein drift monitor (22nd stateful op) —
    the live twin of the batch ``wasserstein_1d`` operator against a
    REFERENCE histogram fixed at tuning time, and the
    distance-semantics complement of :func:`stream_psi`: PSI scores
    per-bin RATIO surprise (explodes when mass lands in an empty
    reference bin, blind to how far it moved); W₁ is the integral
    |CDF gap| across the ordered bins, so "mass moved one bin" and
    "mass moved nine bins" — identical to PSI — differ 9× here. In
    bin-width units::

        W₁ = Σ_b |CumRef(b)·n_cur − CumCur(b)·n_ref| / (n_ref·n_cur)

    Callers bin upstream; ``bin_col`` holds 1-based integer bins in
    [1, bins]; ``ref_counts`` maps group key → reference histogram.
    State per group is the additive count vector — micro-batch
    splits, replays of disjoint slices, and arrival order cannot
    change the drained state. The numerator is exact arbitrary-
    precision Python int; the emitted ``w1_micro = (10⁶·num) div
    (n_ref·n_cur)`` is one integer floor division (engine- and
    batch-split-invariant; ``drifted ⟺ w1_micro > drift_micro``,
    default half a bin width). Groups without a reference histogram
    are dropped. Emits per update: ``group_cols + (counts, n_seen,
    w1_micro, drifted, seq)``."""
    group_cols = list(group_cols)
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    ref = {
        (k if isinstance(k, tuple) else (k,)): [int(c) for c in v]
        for k, v in ref_counts.items()
    }
    if any(len(v) != bins for v in ref.values()):
        raise ValueError("every ref_counts entry must have `bins` counts")
    if any(sum(v) <= 0 for v in ref.values()):
        raise ValueError("every ref_counts histogram must be non-empty")
    src = df.where(
        F.col(bin_col).isNotNull()
        & (F.col(bin_col) >= 1)
        & (F.col(bin_col) <= bins)
    ).select(*group_cols, F.col(bin_col).cast("long").alias("__bin"))
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [
            StructField("counts", ArrayType(LongType()), False),
            StructField("n_seen", LongType(), False),
            StructField("w1_micro", LongType(), False),
            StructField("drifted", BooleanType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("counts", ArrayType(LongType()), True),
            StructField("seq", LongType(), True),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        rc = ref.get(tuple(key))
        if rc is None:
            return
        if state.exists:
            counts, seq = state.get
            counts = [int(v) for v in counts]
            seq = int(seq)
        else:
            counts, seq = [0] * bins, 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            for b, cnt in pdf["__bin"].value_counts().items():
                counts[int(b) - 1] += int(cnt)
        if n_new == 0:
            return
        seq += 1
        state.update((counts, seq))
        nr, nc = sum(rc), sum(counts)
        num = 0
        cr = cc = 0
        # last bin's CDF gap is 0 by construction — sum the first b-1
        for r, c in zip(rc[:-1], counts[:-1]):
            cr += r
            cc += c
            num += abs(cr * nc - cc * nr)
        w1_micro = (1_000_000 * num) // (nr * nc)
        out = pd.DataFrame(
            {
                "counts": [counts],
                "n_seen": pd.array([nc], dtype="Int64"),
                "w1_micro": pd.array([w1_micro], dtype="Int64"),
                "drifted": [w1_micro > drift_micro],
                "seq": pd.array([seq], dtype="Int64"),
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        yield out[[*group_cols, "counts", "n_seen", "w1_micro",
                   "drifted", "seq"]]

    return src.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
