"""Sources & sinks beyond parquet (SURVEY §2.1 S4/S9/S11/S12/S13).

The reference moves data as CSV strings between Snowflake, pandas and
Flask (``tools/snowflake_tool.py:151-152``), renders HTML tables
(``main.py:65``) and pretty JSON (``tools/data_matrix_tool.py:88-89``).
Engine-side equivalents, kept explicit-schema (no inference in prod).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S4 with an explicit schema (the reference lets pandas infer —
    SURVEY §1.3 flags that as the anti-pattern to avoid)."""
    return spark.read.csv(path, header=True, schema=schema)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9: CSV sink.  ``single_file`` coalesces to one partition — only
    for small result sets (driver-sized), never for table-scale data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def to_json_records(df: DataFrame) -> DataFrame:
    """S11: one JSON string per row (``F.to_json(struct(*))``), the
    distributed equivalent of the reference's ``json.dumps`` loops."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))


def to_html_table(df: DataFrame, max_rows: int = 1000, classes: str = "data") -> str:
    """S10: HTML table sink — the engine-side twin of the reference's
    ``df.to_html(classes='data')`` (``main.py:65``).

    Presentation-only by design: the reference renders a driver-sized
    result page, so the collect is hard-capped at ``max_rows`` (+1 probe
    row to detect truncation — rendering 100 TB as HTML is never the
    plan).  Raises if the result exceeds the cap rather than silently
    dropping rows."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; HTML rendering is for "
            "driver-sized reports — aggregate or limit first"
        )
    import html as _html

    def esc(v: object) -> str:
        return _html.escape("" if v is None else str(v))

    head = "".join(f"<th>{esc(c)}</th>" for c in df.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{esc(v)}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return (
        f'<table border="1" class="{_html.escape(classes)}">'
        f"<thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )


def clone_table(spark: SparkSession, source: str, target: str) -> None:
    """S12: ``CREATE TABLE … CLONE`` equivalent.  Spark has no zero-copy
    clone; a CTAS copy preserves the semantics the reference's test
    fixture relies on (mutate the clone, diff against the original)."""
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"CREATE TABLE {target} AS SELECT * FROM {source}")


def insert_overwrite(df: DataFrame, table: str) -> None:
    """S13: ``INSERT OVERWRITE`` sink (converter rule 28)."""
    df.write.mode("overwrite").insertInto(table, overwrite=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Hive-style partitioned parquet sink — the data-layout half of the
    100 TB posture: a scan filtered on a partition column reads ONLY the
    matching directories (partition pruning happens at the file index,
    before any row is touched), and downstream date/tenant/table
    predicates become directory listings instead of data scans.

    ``dynamic=True`` switches overwrite to per-partition: only the
    partitions present in ``df`` are replaced, the rest are untouched —
    the idempotent-backfill / at-least-once-replay pattern the streaming
    sink uses (``incremental_validation_to_parquet``)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)
