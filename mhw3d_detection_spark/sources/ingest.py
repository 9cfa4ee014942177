"""Ingestion bridges: dense gridded arrays -> the engine's long format
(SURVEY.md §2.1 SC1/SC4/SC5).

The reference consumes dense labeled arrays (`xr.open_dataset`,
reference README.md:51); this engine's canonical input is the long
table ``ts(cell_id, time[, coords...], temp)``. The melt happens ONCE
at ingestion and everything downstream is relational.

Scale notes: the melt streams spatial blocks (never materializes the
full cube in driver memory), writes partitioned/bucketed parquet so the
per-cell operators start co-located, and the `cell_id` key is a dense
integer (`lat_idx * n_lon + lon_idx`), which hash-partitions uniformly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def dense_to_long(
    spark: SparkSession,
    temp: "np.ndarray",
    times: "pd.DatetimeIndex",
    coords: dict[str, "np.ndarray"] | None = None,
    *,
    value_col: str = "temp",
    block_cells: int = 4096,
) -> DataFrame:
    """Melt a dense ``(time, *spatial)`` array into the long table.

    ``coords`` maps spatial dim name -> 1-D coordinate array (in axis
    order after time), e.g. ``{"lat": lats, "lon": lons}``; cell_id is
    the row-major flat index over the spatial axes. NaNs become NULLs
    (measured-but-missing rows are kept — the §1.2 presence semantics).

    Blocks of ``block_cells`` cells are melted and unioned lazily, so
    driver memory is O(block) not O(cube).
    """
    coords = coords or {}
    t = np.asarray(temp)
    n_time = t.shape[0]
    if len(times) != n_time:
        raise ValueError("times length must match temp.shape[0]")
    spatial_shape = t.shape[1:]
    n_cells = int(np.prod(spatial_shape)) if spatial_shape else 1
    flat = t.reshape(n_time, n_cells)

    coord_names = list(coords)
    if coord_names and len(coord_names) != len(spatial_shape):
        raise ValueError("one coord array per spatial axis")
    grids = (
        np.meshgrid(*[coords[c] for c in coord_names], indexing="ij")
        if coord_names
        else []
    )
    flat_coords = {
        c: g.reshape(n_cells) for c, g in zip(coord_names, grids)
    }

    time_vals = pd.DatetimeIndex(times)

    def blocks() -> Iterator[pd.DataFrame]:
        for lo in range(0, n_cells, block_cells):
            hi = min(lo + block_cells, n_cells)
            width = hi - lo
            pdf = pd.DataFrame(
                {
                    "cell_id": np.repeat(
                        np.arange(lo, hi, dtype=np.int64), n_time
                    ),
                    "time": np.tile(time_vals.values, width),
                    value_col: flat[:, lo:hi].T.reshape(-1),
                }
            )
            for c in coord_names:
                pdf[c] = np.repeat(flat_coords[c][lo:hi], n_time)
            yield pdf

    out: DataFrame | None = None
    for pdf in blocks():
        part = spark.createDataFrame(pdf)
        out = part if out is None else out.unionByName(part)
    assert out is not None
    return out


def write_partitioned(
    df: DataFrame, path: str, *, by_year: bool = True, time_col: str = "time"
) -> None:
    """Parquet sink (SC4) with year partition folders: baseline filters
    (P2) become partition pruning instead of row-group skipping."""
    from pyspark.sql import functions as F

    if by_year:
        df.withColumn("year", F.year(time_col)).write.mode(
            "overwrite"
        ).partitionBy("year").parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str = "cell_id",
    buckets: int = 64,
    sort_by: str | None = "time",
) -> None:
    """Bucketed managed-table sink (SC5): pre-shuffles by ``key`` at
    write time so every downstream per-cell window/agg/join starts
    co-located — scans of two tables bucketed on the same key join with
    NO exchange (asserted in tests/test_plan_shape.py)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def zorder_key(x: "Column | str", y: "Column | str", bits: int = 16):
    """Morton / Z-order key: bit-interleave two non-negative integer
    grid coordinates into one BIGINT — ``bit 2i = x_i, bit 2i+1 =
    y_i`` — so lexicographic order on the key visits the plane in the
    Z curve and RANGES of the key are spatially compact squares. This
    is the multi-dimensional clustering trick behind Delta's OPTIMIZE
    ZORDER and Iceberg's z-ordered sort orders: parquet row-group
    min/max stats on the layout key become tight bounding boxes on
    BOTH dims, so a range predicate on EITHER dimension prunes
    row groups — a plain sort on one column only ever prunes that
    column.

    Pure integer shift/mask/or arithmetic (no UDF, exact in any
    engine); inputs must already be quantized to ``[0, 2^bits)`` —
    callers map floats onto a grid first (the caller owns the
    resolution trade-off: more bits = finer boxes, deeper key).
    """
    from pyspark.sql import functions as F

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xl, yl = xc.cast("long"), yc.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Z-order-clustered parquet sink: key every row
    (:func:`zorder_key`), range-partition on the key (equal-size
    output files via sampled range bounds — no hot file on skewed
    grids), sort within each partition, write. Each output file then
    covers a compact square of (x, y) space, so its parquet footer
    min/max on x and y are tight: a spatial box filter at read time
    skips most files/row-groups entirely. The whole pass is one
    range-exchange + local sort — the same cost as any clustered
    write, paid once at layout time for every later scan.
    """
    from pyspark.sql import functions as F

    keyed = df.withColumn("__z", zorder_key(x_col, y_col, bits))
    part = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files
        else keyed.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def compact_files(
    spark,
    in_path: str,
    out_path: str,
    *,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — the maintenance pass every long-running
    100 TB table needs (each micro-batch/task writes its own parquet
    file; a few thousand 100 KB files make every later scan pay one
    footer read + task launch per file, and object stores throttle the
    listing long before that). Reads the fragmented table, sizes the
    output by an exact count (``ceil(rows / target)`` files), and
    rewrites:

    - with ``sort_cols``: ``repartitionByRange`` + local sort — the
      compaction doubles as re-clustering, so footer min/max stay
      tight on the sort key (the Delta/Iceberg ``OPTIMIZE`` shape;
      pair with :func:`write_zordered` for 2-D keys);
    - without: ``coalesce`` when shrinking (a NARROW dependency — no
      shuffle at all, the cheap pure-compaction path), full
      ``repartition`` only when the table needs MORE files than it
      has partitions.

    Returns the number of output files requested. Deterministic row
    content; file assignment is whatever the chosen exchange produces
    (compaction is a LAYOUT operation — readers must not depend on
    file boundaries, which is the point).
    """
    import math

    df = spark.read.parquet(in_path)
    n = df.count()
    files = max(1, math.ceil(n / int(target_rows_per_file)))
    if sort_cols:
        out = df.repartitionByRange(files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    elif files <= df.rdd.getNumPartitions():
        out = df.coalesce(files)
    else:
        out = df.repartition(files)
    out.write.mode("overwrite").parquet(out_path)
    return files


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    partitions: int | None = None,
) -> None:
    """JSON-Lines sink (SC6, r12) — the LLM-corpus interchange format:
    one JSON object per line, gzip by default (the shape crawl dumps,
    eval sets, and most open text datasets ship in). Each output part
    is written by its own task, so the sink scales with the cluster
    like the parquet sinks; ``partitions`` caps the file count for
    hand-off (a coalesce, not a shuffle).

    Parquet remains the engine-side format (columnar pruning, pushdown,
    stats) — this sink exists for the pipeline BOUNDARY where another
    team's tooling expects JSONL.
    """
    w = df.coalesce(int(partitions)) if partitions else df
    writer = w.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-Lines source (SC6, r12). ``schema`` is REQUIRED (a DDL
    string): schema inference on 100 TB of JSONL is a full extra pass
    over the data and silently unions drifting shapes — an explicit
    contract fails loud instead. ``mode`` follows Spark's JSON reader:
    FAILFAST (default — corrupt line kills the read), PERMISSIVE
    (corrupt line -> all-NULL row), DROPMALFORMED. Compression is
    sniffed per-file from the extension, so mixed .gz/.zst/plain
    directories read fine; gzip parts are NOT splittable — write many
    parts (the write_jsonl default) so parallelism comes from file
    count, not intra-file splits.
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .json(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    compression: str | None = "gzip",
    partitions: int | None = None,
    delimiter: str = ",",
) -> None:
    """CSV sink (SC8, r13) — the lowest-common-denominator interchange
    format every spreadsheet/BI/legacy tool reads. RFC-4180 dialect:
    fields containing the delimiter, quote or a newline are quoted and
    embedded quotes are DOUBLED (``escape='"'`` — Spark's default
    backslash escaping is not RFC and breaks naive downstream
    parsers). NULL writes as the unquoted ``\\N`` sentinel (the
    MySQL-dump convention) and the empty STRING as a quoted ``""``: a
    plain empty field cannot carry the distinction, because CSV
    parsers (Spark's univocity included) collapse quoted and unquoted
    empties BEFORE null mapping — measured, not assumed. With the
    paired :func:`read_csv` options the null/empty distinction —
    CSV's classic lossy corner — survives the round trip.

    Documented exception, pinned in tests: a string VALUE equal to the
    two characters ``\\N`` is indistinguishable from NULL in this
    dialect and reads back as NULL — quoting does not rescue it
    (measured: the univocity reader applies nullValue after
    unquoting, so a quoted ``"\\N"`` still maps to NULL). Corpora
    where that byte sequence is live data should ship through the
    JSONL boundary (SC6), which has no sentinel class.

    Like the JSONL sink: each part is written by its own task,
    ``partitions`` caps file count via coalesce, and parquet remains
    the engine-side format — this is the pipeline BOUNDARY sink.
    """
    w = df.coalesce(int(partitions)) if partitions else df
    writer = (
        w.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    mode: str = "FAILFAST",
    delimiter: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """CSV source (SC8, r13). ``schema`` is REQUIRED (a DDL string) for
    the same reason as :func:`read_jsonl`: inference is an extra full
    pass and silently promotes drifting columns. ``mode``: FAILFAST
    (default — a malformed line kills the read), PERMISSIVE (malformed
    -> all-NULL row), DROPMALFORMED. Options mirror :func:`write_csv`
    (RFC quote-doubling, unquoted ``\\N`` = NULL, quoted or bare empty
    = empty string) so a write/read pair is lossless including the
    null/empty distinction — except the one documented sentinel
    collision: a string value that IS the two characters ``\\N`` reads
    back as NULL (see :func:`write_csv`). Read-side note:
    ``emptyValue`` here is the REPLACEMENT value for a parsed-empty
    field (univocity semantics), so it is the empty string, not the
    writer's ``'\"\"'`` marker.

    ``multi_line`` MUST be set when any field can contain a newline
    (quoted multi-line records). The cost is real and documented: a
    multiLine file cannot be split on newlines, so parallelism drops
    to per-FILE — write many parts on the producing side (the
    write_csv default) exactly like gzip'd JSONL.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .option("multiLine", str(multi_line).lower())
        .csv(path)
    )
