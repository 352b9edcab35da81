"""Sources & sinks: schema-declared CSV/Parquet/SQLite ingest.

Replaces the reference's eager loaders — ``pd.read_csv`` with dtype
inference (main.py:18,239,450) and whole-table ``read_sql_query`` over
every row of SQLite (main.py:223-235) — with lazy, schema-declared,
pushdown-friendly Spark reads. Inference on 100 TB means a second full
scan, and SQLite through a single connection is a one-node bottleneck,
so SQLite is converted once to Parquet and all analytics read Parquet.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid_engineering_spark import schemas

_SNAKE_RE = re.compile(r"[^0-9a-zA-Z]+")


def snake_case(name: str) -> str:
    """Normalize a reference header (``Country.Region``, ``Deaths / 100
    Cases``, ``No. of countries``) to a SQL-safe snake_case identifier.
    Dotted/spaced names are legal in Spark but need backtick quoting
    everywhere (SURVEY.md §7.4); normalizing once at ingest is cheaper.
    """
    return _SNAKE_RE.sub("_", name.strip()).strip("_").lower()


def read_covid_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    renames: dict[str, str] | None = None,
    date_cols: tuple[str, ...] = ("date",),
    date_fmt: str | None = None,
) -> DataFrame:
    """CSV scan with declared schema and the reference's null/date
    semantics (S1/S4, main.py:18,239-241,450,561):

    * literal ``NA`` strings parse as null (``nullValue``),
    * dates parse via ``to_date`` — unparseable becomes null (the
      moral equivalent of ``errors='coerce'``) and the caller decides
      whether to ``na.drop`` (P4),
    * headers are renamed to snake_case before the schema is applied.
    """
    raw = (
        spark.read.option("header", True)
        .option("nullValue", "NA")
        .option("encoding", "UTF-8")
        .csv(path)
    )
    if renames:
        raw = raw.select([F.col(f"`{c}`").alias(renames.get(c, snake_case(c))) for c in raw.columns])
    else:
        raw = raw.select([F.col(f"`{c}`").alias(snake_case(c)) for c in raw.columns])
    cols = []
    for field in schema.fields:
        src = field.name if field.name in raw.columns else None
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        c = F.col(src)
        if isinstance(field.dataType, T.DateType):
            c = F.to_date(c, date_fmt) if date_fmt else F.to_date(c)
        else:
            c = c.cast(field.dataType)
        cols.append(c.alias(field.name))
    return raw.select(cols)


def sqlite_to_parquet(db_path: str, out_dir: str) -> dict[str, str]:
    """One-time S2/S3 ingest: enumerate the SQLite catalog and convert
    every table to Parquet (reference slurps each into pandas per run,
    main.py:223-235). Runs driver-side on purpose — it is a one-shot
    migration of a ~60 MB operational store, not a query path; after
    it, all reads are parallel Parquet scans.
    """
    import sqlite3

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}
    with sqlite3.connect(db_path) as conn:
        names = [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        ]
        for name in names:
            pdf = pd.read_sql_query(f'SELECT * FROM "{name}"', conn)  # noqa: S608
            pdf.columns = [snake_case(c) for c in pdf.columns]
            dest = os.path.join(out_dir, f"{snake_case(name)}.parquet")
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), dest)
            out[snake_case(name)] = dest
    return out


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet carries INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. With
    ``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as
    LongType nanos; integer-divide to micros (exact — a double division
    would lose precision past 2^53) and rebuild a timestamp_ntz. Falls
    back to a driver-side pyarrow read only if the session config is
    immutable (never on our own sessions).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            raw = raw.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return raw.select([f.name for f in schemas.STAR["events"].fields])
    except Exception:
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf["ts"] = pdf["ts"].dt.floor("us")
        return spark.createDataFrame(pdf, schema=schemas.STAR["events"])


def read_table(
    spark: SparkSession, sf_dir: str, name: str, *, fan: bool = False
) -> DataFrame:
    """Read one star-schema table from a scale-factor directory with its
    declared schema (no inference, no footer merging).

    ``fan=True`` wraps the scan in :func:`fan_out` (guarded round-robin
    repartition to the session's default parallelism, identity when the
    scan already carries enough splits — functions/partitioning.py):
    Spark splits parquet by bytes and never below one row group, so a
    small or single-row-group file scans as ONE task and a compute-dense
    map stage fed by it (shingling, hashing, dot products) runs on one
    core while the rest idle. Opt-in per call site, not universal: the
    exchange only pays for itself where downstream per-row work dwarfs
    the row-moving cost (A/B-measured per operator — cheap relational
    scans and broadcast-probe plans get slower, so they stay ``False``).
    Only for operators whose results are partition-independent (the
    oracle sweep re-proves each). Catalyst pushes filters and column
    pruning through Repartition, so PushedFilters/ReadSchema at the
    scan are unchanged. ``SPARK_GRAFT_FANOUT=0`` disables globally
    (A/B harness).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _read_events(spark, path)
    else:
        df = spark.read.schema(schemas.STAR[name]).parquet(path)
    if fan and os.environ.get("SPARK_GRAFT_FANOUT", "1") != "0":
        from covid_engineering_spark.functions.partitioning import fan_out

        df = fan_out(df)
    return df


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Persist hive-partitioned parquet (one directory per key value).
    The analytics layout for the COVID model (SURVEY.md §4): cleaned
    data partitioned by country_region turns every per-country filter
    (P2 — the reference's hottest access path) into partition pruning:
    the files of other countries are never opened. Keep partition keys
    low-cardinality (countries: ~200 dirs); high-cardinality keys
    belong in bucketing instead.
    """
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist a table bucketed + sorted on its join key. Two tables
    bucketed the same way equi-join with ZERO exchanges — at 100 TB
    this converts every recurring fact⨝fact join from a full shuffle
    into a per-bucket merge. The bucket count is a layout decision:
    pick it for the *target* cluster's parallelism, not the current
    data size (buckets are split across executors but never merged).
    """
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def write_range_sorted(
    df: DataFrame, path: str, key: str, n_files: int
) -> None:
    """Persist parquet range-clustered on ``key``: rows are range
    partitioned into ``n_files`` files and sorted within each, so
    every file owns a disjoint key interval. At 100 TB this is the
    layout that makes range predicates (time slices, id ranges) skip
    whole files on footer min/max stats instead of scanning and
    discarding — the poor man's clustering index, no table format
    required. Use for the dominant range-filter column; combine with
    ``partitionBy`` on a coarser key for two-level pruning.
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(x, y, bits: int = 16):
    """Morton / Z-order interleaved sort key for two non-negative
    integer columns of ``bits`` each: bit i of ``x`` lands at position
    2i, bit i of ``y`` at 2i+1. Sorting on the interleaved key gives
    BOTH dimensions file-level locality at once — the multi-column
    clustering technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
    here as a plain column expression over integer shifts/masks: pure
    whole-stage codegen, no UDF, and bit-identical in any engine, so a
    z-ordered layout's sort key can be recomputed and audited
    off-cluster. Callers must reduce inputs to [0, 2^bits) first
    (modulo, epoch-day, quantile bucket — the reduction choice is the
    clustering policy). Combine with ``write_range_sorted`` on the
    returned key: range partitioning then gives every file a disjoint
    z-interval, i.e. a bounded rectangle-ish region of (x, y) space,
    and predicates on EITHER column skip files on footer min/max.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    schema,
    target_files: int,
) -> None:
    """Rewrite a small-file parquet directory into ``target_files``
    files. Small files are the dominant operational failure of long
    running ingest at scale: a scan's task count (and the namenode /
    object-store request load) is driven by FILE COUNT, not bytes.
    Compaction is a single narrow-read + round-robin repartition +
    write; run it per partition directory so each rewrite is bounded.
    On a cluster, pick ``target_files`` as bytes / 128 MB, never 1
    (one file serializes the next scan).
    """
    df = spark.read.schema(schema).parquet(in_path)
    df.repartition(target_files).write.mode("overwrite").parquet(out_path)


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table lazily; nothing is scanned until an
    action runs, so loading all ten costs only catalog metadata.
    """
    return {name: read_table(spark, sf_dir, name) for name in schemas.STAR_TABLES}


def register_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register temp views so both the DataFrame API and
    ``spark.sql`` see the same tables.
    """
    tables = load_star(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
