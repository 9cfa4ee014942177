"""Ingestion bridges (SC1/SC4/SC5): dense-cube melt round-trip and the
bucketed-write co-location contract."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mhw3d_detection_spark.sources.ingest import (
    dense_to_long,
    write_bucketed,
)


def test_dense_to_long_roundtrip(spark):
    rng = np.random.default_rng(7)
    times = pd.date_range("2000-01-01", periods=10, freq="D")
    lats = np.array([-42.0, -41.0])
    lons = np.array([152.0, 153.0, 154.0])
    cube = rng.normal(15.0, 2.0, size=(10, 2, 3))
    cube[3, 1, 2] = np.nan  # measured-but-missing

    long = dense_to_long(
        spark, cube, times, {"lat": lats, "lon": lons}, block_cells=2
    )
    pdf = long.toPandas()
    assert len(pdf) == 10 * 2 * 3
    assert set(pdf.columns) == {"cell_id", "time", "temp", "lat", "lon"}
    # spot-check a value and the coord layout (row-major cell ids)
    got = pdf[(pdf.cell_id == 5) & (pdf.time == times[3])]
    assert len(got) == 1
    v = got.temp.iloc[0]
    assert v != v  # the NaN landed at cell (1,2) = id 5
    assert got.lat.iloc[0] == -41.0 and got.lon.iloc[0] == 154.0
    ok = pdf[(pdf.cell_id == 4) & (pdf.time == times[9])]
    assert np.isclose(ok.temp.iloc[0], cube[9, 1, 1])


def test_bucketed_join_has_no_exchange(spark):
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("cell_id"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_a", key="cell_id", buckets=8, sort_by=None)
    write_bucketed(df, "t_b", key="cell_id", buckets=8, sort_by=None)
    a = spark.table("t_a").groupBy("cell_id").agg(F.sum("v").alias("sa"))
    b = spark.table("t_b").groupBy("cell_id").agg(F.sum("v").alias("sb"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "cell_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")
    assert "Exchange hashpartitioning" not in plan, plan


def test_zorder_key_is_the_morton_interleave(spark):
    from mhw3d_detection_spark.sources.ingest import zorder_key

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key("x", "y", bits=3)).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}
    # the Z curve's defining property: key ranges are compact squares —
    # the first quarter of the key space is exactly the SW quadrant
    quad = {k for k, z in got.items() if z < 16}
    assert quad == {(x, y) for x in range(4) for y in range(4)}


def test_zordered_write_files_are_bounding_boxes(spark, tmp_path):
    # The point of the layout: each output file's parquet min/max span
    # on BOTH dims is a quadrant, not the full domain — so a range
    # filter on EITHER dim can skip ~half the files. A shuffled
    # (hash-distributed) write spans nearly the whole domain per file.
    import pyarrow.parquet as pq_

    from mhw3d_detection_spark.sources.ingest import write_zordered

    n = 64
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, v long").repartition(7)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", bits=6, n_files=4)

    hpath = str(tmp_path / "hashed")
    df.repartition(4, "v").write.mode("overwrite").parquet(hpath)

    def spans(path):
        import os

        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            t = pq_.read_table(f"{path}/{f}", columns=["x", "y"])
            xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
            out.append(
                (max(xs) - min(xs) + 1, max(ys) - min(ys) + 1)
            )
        return out

    zs = spans(zpath)
    assert len(zs) == 4
    hs = spans(hpath)
    # range bounds are SAMPLED (seed varies per run), so files can
    # straddle quadrant seams and individual spans wobble — the
    # sampling-robust invariant is the bounding-box AREA (the stats a
    # reader prunes on): a ~quarter-of-the-curve key interval can
    # cover at most ~2 quadrants plus seam slivers (< ~0.65 of the
    # domain), while a hash file's box is essentially the full domain
    domain = n * n
    for sx, sy in zs:
        assert sx * sy <= 0.72 * domain, (zs,)
    for sx, sy in hs:
        assert sx * sy > 0.85 * domain, (hs,)
    assert sum(sx * sy for sx, sy in zs) <= 0.75 * sum(
        sx * sy for sx, sy in hs
    ), (zs, hs)


class TestCompactFiles:
    def test_compacts_fragmented_table(self, spark, tmp_path):
        from mhw3d_detection_spark.sources.ingest import compact_files

        src = str(tmp_path / "fragmented")
        dst = str(tmp_path / "compacted")
        # 40 tiny files of 50 rows each
        spark.range(2000).withColumnRenamed("id", "k").repartition(
            40
        ).write.parquet(src)
        import glob

        assert len(glob.glob(src + "/part-*")) == 40
        files = compact_files(spark, src, dst, target_rows_per_file=1000)
        assert files == 2
        assert len(glob.glob(dst + "/part-*")) == 2
        # row content preserved exactly
        a = sorted(r["k"] for r in spark.read.parquet(dst).collect())
        assert a == list(range(2000))

    def test_sorted_compaction_tightens_footers(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from mhw3d_detection_spark.sources.ingest import compact_files

        src = str(tmp_path / "frag2")
        dst = str(tmp_path / "sorted2")
        spark.range(4000).withColumnRenamed("id", "k").repartition(
            16
        ).write.parquet(src)
        compact_files(
            spark, src, dst, target_rows_per_file=1000, sort_cols=["k"]
        )
        import glob

        spans = []
        for f in glob.glob(dst + "/part-*.parquet"):
            md = pq.read_metadata(f)
            mn = min(
                md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((mn, mx))
        spans.sort()
        # range-partitioned + sorted: file spans must not overlap
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi < b_lo


class TestJsonlRoundTrip:
    """SC6 (r12): JSONL is the pipeline-boundary interchange format —
    the round trip through the sink+source must be lossless against
    the parquet original, including NULLs and unicode text."""

    def test_documents_roundtrip_exact(self, spark, tmp_path):
        from mhw3d_detection_spark.sources.ingest import (
            read_jsonl,
            write_jsonl,
        )
        from mhw3d_detection_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        path = str(tmp_path / "docs_jsonl")
        write_jsonl(docs, path, partitions=3)
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in docs.schema
        )
        back = read_jsonl(spark, path, schema)
        want = {tuple(r) for r in docs.collect()}
        got = {tuple(r) for r in back.collect()}
        assert got == want

    def test_nulls_and_unicode_survive(self, spark, tmp_path):
        from mhw3d_detection_spark.sources.ingest import (
            read_jsonl,
            write_jsonl,
        )

        rows = [
            (1, "héllo wörld é中文", 3.5),
            (2, None, None),
            (3, 'quotes " and \\ backslash', -0.0),
        ]
        df = spark.createDataFrame(rows, "id long, text string, score double")
        path = str(tmp_path / "uni")
        write_jsonl(df, path, compression=None, partitions=1)
        back = read_jsonl(spark, path, "id long, text string, score double")
        got = {r.id: (r.text, r.score) for r in back.collect()}
        assert got[1] == ("héllo wörld é中文", 3.5)
        assert got[2] == (None, None)
        assert got[3][0] == 'quotes " and \\ backslash'

    def test_failfast_on_corrupt_line(self, spark, tmp_path):
        import gzip
        import os

        import pytest

        from mhw3d_detection_spark.sources.ingest import read_jsonl

        d = tmp_path / "bad"
        d.mkdir()
        (d / "part-0.json").write_text(
            '{"id": 1, "text": "ok"}\n{"id": oops not json\n'
        )
        with pytest.raises(Exception):
            read_jsonl(
                spark, str(d), "id long, text string"
            ).collect()
        # PERMISSIVE: the corrupt line becomes an all-NULL row instead
        rows = read_jsonl(
            spark, str(d), "id long, text string", mode="PERMISSIVE"
        ).collect()
        assert len(rows) == 2
        assert {r.id for r in rows} == {1, None}
        # DuckDB's ignore_errors lands on the SAME convention as Spark
        # PERMISSIVE: the corrupt line becomes an all-NULL row (cross-
        # engine boundary check without a registered oracle row)
        import duckdb

        dd = duckdb.connect().execute(
            "SELECT id, text FROM read_json(?, format='newline_delimited', "
            "columns={'id': 'BIGINT', 'text': 'VARCHAR'}, "
            "ignore_errors=true)",
            [str(d / "part-0.json")],
        ).fetchall()
        assert set(dd) == {(1, "ok"), (None, None)}


class TestCsvRoundTrip:
    """SC8 (r13): CSV is the lowest-common-denominator boundary format.
    The paired sink/source options (RFC quote-doubling, unquoted-empty
    = NULL, quoted-empty = empty string) must make the round trip
    lossless — including the null-vs-empty distinction CSV classically
    destroys — and the malformed-line modes must behave like the JSONL
    source's."""

    def test_documents_roundtrip_exact(self, spark, tmp_path):
        from mhw3d_detection_spark.sources.ingest import read_csv, write_csv
        from mhw3d_detection_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        path = str(tmp_path / "docs_csv")
        write_csv(docs, path, partitions=3)
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in docs.schema
        )
        back = read_csv(spark, path, schema)
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in docs.collect()
        }

    def test_quoting_newline_null_vs_empty(self, spark, tmp_path):
        from mhw3d_detection_spark.sources.ingest import read_csv, write_csv

        rows = [
            (1, 'comma, "quotes" and more', 3.5),
            (2, None, None),          # NULL text
            (3, "", -0.0),            # EMPTY text — must stay distinct
            (4, "line1\nline2", 1.0),  # embedded newline
            (5, "héllo é中文", 2.0),
        ]
        df = spark.createDataFrame(rows, "id long, text string, score double")
        path = str(tmp_path / "edge")
        write_csv(df, path, compression=None, partitions=1)
        back = read_csv(
            spark, path, "id long, text string, score double",
            multi_line=True,
        )
        got = {r.id: (r.text, r.score) for r in back.collect()}
        assert got[1] == ('comma, "quotes" and more', 3.5)
        assert got[2] == (None, None)
        assert got[3] == ("", -0.0)
        assert got[4] == ("line1\nline2", 1.0)
        assert got[5] == ("héllo é中文", 2.0)

    def test_malformed_modes(self, spark, tmp_path):
        import pytest

        from mhw3d_detection_spark.sources.ingest import read_csv

        d = tmp_path / "bad"
        d.mkdir()
        (d / "part-0.csv").write_text(
            "id,text\n1,ok\noops,not a long\n2,fine\n"
        )
        schema = "id long, text string"
        with pytest.raises(Exception):
            read_csv(spark, str(d), schema).collect()
        kept = read_csv(
            spark, str(d), schema, mode="DROPMALFORMED"
        ).collect()
        assert {r.id for r in kept} == {1, 2}
        perm = read_csv(spark, str(d), schema, mode="PERMISSIVE").collect()
        assert len(perm) == 3
        # PERMISSIVE nulls the untypeable field, keeps the parsable one
        bad = [r for r in perm if r.id is None]
        assert len(bad) == 1 and bad[0].text == "not a long"
        # DuckDB's ignore_errors lands on Spark's DROPMALFORMED
        # convention for CSV (drops the line) — boundary check
        import duckdb

        dd = duckdb.connect().execute(
            "SELECT id, text FROM read_csv(?, header=true, "
            "columns={'id': 'BIGINT', 'text': 'VARCHAR'}, "
            "ignore_errors=true) ORDER BY id",
            [str(d / "part-0.csv")],
        ).fetchall()
        assert [r[0] for r in dd] == [1, 2]
