"""Round-12 streaming restart-recovery parity (VERDICT r11 Next #2).

The one failure mode a 100-TB nightly monitor actually hits: the
driver dies and the query restarts from ``checkpointLocation``. These
tests stop a stateful query mid-stream and restart it from the same
checkpoint, asserting the emitted rows are bit-identical to the
uninterrupted batch twin and that nothing double-emits:

- ``streaming_drift_gate`` (the only ``applyInPandasWithState`` user —
  its per-window histogram state lives in the state store): restarted
  both MID-WINDOW (no emission before the stop, every histogram
  partial must survive) and ACROSS a window close (one window emitted
  before the stop — it must not re-emit after).
- ``streaming_cardinality`` (representative built-in windowed-agg
  state): day-0 registers emit before the stop, day-1/2 register state
  crosses the restart and must come out bit-identical to the batch
  sketch.

The memory sink does not support checkpoint recovery, so these drive a
fault-tolerant parquet FILE sink and read emissions back through its
``_spark_metadata`` log (exactly-once across the restart is part of
what's being asserted).
"""

import datetime as dt
import random

from pyspark.sql import functions as F


def _run_to_parquet(gate_df, out, ckpt):
    q = (
        gate_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _read_out(spark, out, schema):
    # explicit schema: before the first emission the sink dir has only
    # _spark_metadata and schema inference would fail on zero files
    return spark.read.schema(schema).parquet(out)


def _drift_inputs(spark):
    from mhw3d_detection_spark.operators.analysis import drift_ref_hist

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = drift_ref_hist(docs.filter(F.col("doc_id") % 5 == 4), "n_chars")
    rng = random.Random(23)
    day0 = dt.datetime(2024, 3, 1)
    live = docs.filter(F.col("doc_id") % 5 != 4).select("n_chars").collect()
    rows = [
        (
            day0
            + dt.timedelta(days=rng.randrange(6), hours=rng.randrange(24)),
            float(r.n_chars),
        )
        for r in live
    ]
    df = spark.createDataFrame(rows, "time timestamp, val double")
    return ref, day0, rows, df


def _drift_rows(collected):
    return {
        r.win_id: (r.n_new, r.ks_stat, r.w1_stat, r.psi_stat)
        for r in collected
    }


def test_drift_gate_restart_mid_window_bitexact(spark, tmp_path):
    """Stop with EVERY window still open (nothing emitted), restart,
    finish: the applyInPandasWithState histogram partials must survive
    the restart and every window must close bit-identical to the
    uninterrupted batch twin window_drift_scores."""
    from mhw3d_detection_spark.operators.analysis import window_drift_scores
    from mhw3d_detection_spark.streaming import streaming_drift_gate

    ref, day0, rows, df = _drift_inputs(spark)
    want = _drift_rows(
        window_drift_scores(
            df, ref, "val", time_col="time", window_days=2
        ).collect()
    )
    assert len(want) >= 3

    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    half = len(shuffled) // 2
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "win_id bigint, window_start date, n_new bigint, " \
        "ks_stat double, w1_stat double, psi_stat double"

    def gate():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return streaming_drift_gate(
            stream, ref, "val",
            time_col="time", window_days=2, watermark="7 days",
        )

    # run 1: half the rows, watermark never reaches a window end —
    # state holds a partial histogram for every window, zero emissions
    spark.createDataFrame(shuffled[:half], df.schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)
    assert _read_out(spark, out, schema).count() == 0

    # run 2 (RESTART from the same checkpoint): the other half + the
    # far-future sentinel that closes every real window
    spark.createDataFrame(shuffled[half:], df.schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(
        [(day0 + dt.timedelta(days=400), 0.0)], df.schema
    ).coalesce(1).write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)

    got = _drift_rows(_read_out(spark, out, schema).collect())
    assert got == want, (got, want)


def test_drift_gate_restart_across_window_close(spark, tmp_path):
    """Stop AFTER the first window has emitted, restart, finish: the
    closed window must not re-emit (exactly-once across the restart)
    and the windows that close after the restart must still match the
    batch twin bit-for-bit."""
    from mhw3d_detection_spark.operators.analysis import window_drift_scores
    from mhw3d_detection_spark.streaming import streaming_drift_gate

    ref, day0, rows, df = _drift_inputs(spark)
    want = _drift_rows(
        window_drift_scores(
            df, ref, "val", time_col="time", window_days=2
        ).collect()
    )

    # deterministic time-ordered arrival (a short 1-day watermark needs
    # in-order files): days 0-1 | days 2-3 | days 4-5
    by_band = lambda lo, hi: [
        r for r in rows
        if lo <= (r[0] - day0).total_seconds() // 86400 < hi
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "win_id bigint, window_start date, n_new bigint, " \
        "ks_stat double, w1_stat double, psi_stat double"

    def gate():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return streaming_drift_gate(
            stream, ref, "val",
            time_col="time", window_days=2, watermark="1 day",
        )

    # run 1: after the days-2-3 file the watermark (~day 3) passes the
    # first 2-day window's end — it emits, later windows stay open
    for lo, hi in ((0, 2), (2, 4)):
        spark.createDataFrame(by_band(lo, hi), df.schema).coalesce(1) \
            .write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)
    got1 = _drift_rows(_read_out(spark, out, schema).collect())
    assert 0 < len(got1) < len(want)
    assert all(got1[k] == want[k] for k in got1)

    # run 2 (RESTART): days 4-5 + sentinel close the remaining windows
    spark.createDataFrame(by_band(4, 6), df.schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(
        [(day0 + dt.timedelta(days=400), 0.0)], df.schema
    ).coalesce(1).write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)

    got = _drift_rows(_read_out(spark, out, schema).collect())
    assert got == want, (got, want)  # no duplicates, no gaps, same bits


def test_streaming_cardinality_restart_recovery(spark, tmp_path):
    """Representative built-in windowed-agg state across a restart:
    day-0 HLL registers emit before the stop; day-1/day-2 register
    state crosses the restart and every emitted register must be
    bit-identical to the batch sketch over the same rows."""
    from mhw3d_detection_spark.operators.sketches import hll_registers
    from mhw3d_detection_spark.streaming import streaming_cardinality

    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(3):
        for i in range(600 * (day + 1)):
            rows.append(
                (base + dt.timedelta(days=day, seconds=i), f"d{day}-i{i}")
            )
    df = spark.createDataFrame(rows, "time timestamp, token string")
    want = {
        (r.day, r.reg): r.rho
        for r in hll_registers(
            df.select(F.dayofmonth("time").alias("day"), "token"),
            F.col("token"),
            ["day"],
        ).collect()
    }

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "window struct<start:timestamp,end:timestamp>, "
        "reg bigint, rho int"
    )

    def gate():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return streaming_cardinality(
            stream, "token", window="1 day", watermark="1 day"
        )

    # run 1: day 0..2 files in order — after the day-2 file the
    # watermark (~day 1.99) closes ONLY the day-0 window
    for day in range(3):
        spark.createDataFrame(
            [r for r in rows if r[0].day == base.day + day], df.schema
        ).coalesce(1).write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)
    got1 = {
        (r.window.start.day, r.reg): r.rho
        for r in _read_out(spark, out, schema).collect()
    }
    assert got1 and {d for d, _ in got1} == {1}
    assert all(got1[k] == want[k] for k in got1)

    # run 2 (RESTART): sentinel closes day-1 and day-2 — their register
    # state crossed the restart
    spark.createDataFrame(
        [(base + dt.timedelta(days=10), "sentinel")], df.schema
    ).coalesce(1).write.mode("append").parquet(src)
    _run_to_parquet(gate(), out, ckpt)
    got = {
        (r.window.start.day, r.reg): r.rho
        for r in _read_out(spark, out, schema).collect()
    }
    # the sentinel's own window never closes; everything else must be
    # exactly the batch registers, each emitted exactly once
    assert got == want, (len(got), len(want))
    assert len(got) == len(got1) + len(
        {k for k in want if k[0] != 1}
    )


def test_stream_stream_attribution_restart_bitexact(spark, tmp_path):
    """SP8 (r13w2): stream-stream join state must survive a
    checkpoint restart. Phase 1 sees every purchase but only half the
    click files (availableNow to completion); phase 2 restarts the
    SAME checkpoint after the remaining click files land. Purchases
    buffered in the join state store must match clicks that arrive
    only after the restart, already-emitted pairs must not re-emit
    (exactly-once via the parquet sink's _spark_metadata log), and
    the union must equal the uninterrupted batch twin exactly."""
    import os
    import shutil

    from mhw3d_detection_spark.sources.tables import load_table
    from mhw3d_detection_spark.streaming import streaming_attribution_join

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_type"
    )
    purch = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    want = {
        (r.user, r.purchase_ts, r.click_ts)
        for r in streaming_attribution_join(purch, clicks).collect()
    }
    assert len(want) == 25

    p_path = str(tmp_path / "purch")
    c_path = str(tmp_path / "clicks")
    stage = str(tmp_path / "stage")
    purch.repartition(2).write.parquet(p_path)
    clicks.repartition(4).write.parquet(stage)
    parts = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    assert len(parts) == 4
    os.makedirs(c_path)
    for f in parts[:2]:
        shutil.copy(os.path.join(stage, f), os.path.join(c_path, f))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    out_schema = "user bigint, purchase_ts timestamp, click_ts timestamp"

    def run_phase():
        ps = spark.readStream.schema(purch.schema).parquet(p_path)
        cs = spark.readStream.schema(clicks.schema).parquet(c_path)
        q = (
            streaming_attribution_join(ps, cs, watermark="40 days")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_phase()
    phase1 = {
        (r.user, r.purchase_ts, r.click_ts)
        for r in spark.read.schema(out_schema).parquet(out).collect()
    }
    assert phase1 < want  # strictly partial: half the clicks missing

    for f in parts[2:]:
        shutil.copy(os.path.join(stage, f), os.path.join(c_path, f))
    run_phase()
    final = spark.read.schema(out_schema).parquet(out)
    rows = final.collect()
    got = {(r.user, r.purchase_ts, r.click_ts) for r in rows}
    assert got == want
    assert len(rows) == len(got)  # nothing double-emitted
