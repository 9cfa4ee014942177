"""Custom stateful streaming operator: EXACT batch detection semantics,
incrementally (SURVEY.md §2.10 extension surface).

``streaming_event_sessions`` (stock ``session_window``) documents a
semantic divergence from the frozen batch contract: a session window
cannot apply the min-duration filter to *runs* before gap-joining
(reference order: common/core.py:67-74 — W4 strictly before W5). This
operator closes that gap with ``applyInPandasWithState``: per-cell
state carries the in-progress run, the open (already gap-joined) event,
and the per-cell event counter, so the emitted events are byte-for-byte
the batch ``detect_events`` output — same run/min-duration/gap-join
ordering, same event_id numbering.

State machine per cell (ordinals are days since 1970-01-01):

- ``run``   — current contiguous exceed-day run ``[run_s, run_e]``.
- ``event`` — open event ``[ev_s, ev_e]``: concatenation of qualifying
  (>= min_duration) runs whose gaps are <= max_gap.
- a run *closes* when a non-adjacent day arrives; if it qualifies it
  either extends the open event (gap <= max_gap), or *emits* the open
  event and replaces it.
- event-time timeout at ``latest_activity + max_gap + 2 days``: once
  the watermark passes that point no admissible row can extend the run
  (adjacency) or merge with the event (gap bound), so the pending
  run/event are finalized and flushed. State is then removed —
  per-cell state is O(1) and bounded by the watermark.

Scale: state partitions by cell (the same key every other per-cell
operator shuffles on); each cell holds 5 longs of state regardless of
history length.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()

_OUT_SCHEMA = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("event_id", LongType()),
        StructField("date_start", DateType()),
        StructField("date_end", DateType()),
        StructField("duration", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("run_s", LongType()),
        StructField("run_e", LongType()),
        StructField("ev_s", LongType()),
        StructField("ev_e", LongType()),
        StructField("next_id", LongType()),
    ]
)


def streaming_detect_events_exact(
    stream: DataFrame,
    *,
    cell_col: str = "cell_id",
    time_col: str = "time",
    flag_col: str = "exceed",
    min_duration: int = 5,
    max_gap: int = 2,
    watermark: str = "7 days",
) -> DataFrame:
    """Streaming twin of :func:`detect_events` with IDENTICAL semantics
    (min-duration on runs BEFORE gap joining, batch event_id parity).

    Input: a stream of daily rows carrying a boolean ``flag_col``.
    Output (append mode): closed events
    ``(cell_id, event_id, date_start, date_end, duration)``.
    """

    def process(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            run_s, run_e, ev_s, ev_e, next_id = state.get
        else:
            run_s = run_e = ev_s = ev_e = -1
            next_id = 1
        emitted: list[tuple] = []

        def emit_event() -> None:
            nonlocal ev_s, ev_e, next_id
            emitted.append((key[0], next_id, ev_s, ev_e))
            next_id += 1
            ev_s = ev_e = -1

        def close_run() -> None:
            # W4 before W5, exactly like the batch chain.
            nonlocal run_s, run_e, ev_s, ev_e
            if run_s >= 0 and run_e - run_s + 1 >= min_duration:
                if ev_s < 0:
                    ev_s, ev_e = run_s, run_e
                elif run_s - ev_e - 1 <= max_gap:
                    ev_e = run_e
                else:
                    emit_event()
                    ev_s, ev_e = run_s, run_e
            run_s = run_e = -1

        if state.hasTimedOut:
            close_run()
            if ev_s >= 0:
                emit_event()
            # keep only the event counter (5 longs/cell, O(cells) state):
            # a later burst for this cell must continue the numbering
            state.update((-1, -1, -1, -1, next_id))
        else:
            days: set[int] = set()
            for pdf in pdfs:
                hit = pdf[pdf[flag_col].fillna(False)]
                ts = pd.to_datetime(hit[time_col])
                days.update(
                    (ts.values.astype("datetime64[D]").astype("int64")).tolist()
                )
            for d in sorted(days):
                if run_s >= 0 and d <= run_e:
                    continue  # duplicate day
                if run_s >= 0 and d == run_e + 1:
                    run_e = d
                else:
                    close_run()
                    run_s = run_e = d
            state.update((run_s, run_e, ev_s, ev_e, next_id))
            latest = max(run_e, ev_e)
            if latest >= 0:
                # ms epoch; fires once no admissible row can merge
                state.setTimeoutTimestamp(
                    (latest + max_gap + 2) * 86400 * 1000
                )

        if emitted:
            yield pd.DataFrame(
                {
                    "cell_id": [e[0] for e in emitted],
                    "event_id": [e[1] for e in emitted],
                    "date_start": [
                        pd.Timestamp(e[2], unit="D").date() for e in emitted
                    ],
                    "date_end": [
                        pd.Timestamp(e[3], unit="D").date() for e in emitted
                    ],
                    "duration": [int(e[3] - e[2] + 1) for e in emitted],
                }
            )

    # No pre-filter on the exceed flag: event-time progress must come
    # from every arriving sample (a pre-watermark filter gets pushed
    # below the watermark node by Catalyst, so a quiet tail would never
    # advance the clock past the last event's flush horizon). The state
    # function drops non-exceed rows itself.
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(cell_col).cast("long").alias("cell_id"))
        .applyInPandasWithState(
            process,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
