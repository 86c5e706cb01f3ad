"""Sequence packing: lay documents head-to-tail and cut the token
stream into fixed-capacity context windows (GPT-style pretraining
packing — "concat and chunk").

Semantics: within a shard, documents are concatenated in ``order_col``
order; the resulting token stream is split every ``capacity`` tokens.
Each document reports the window its first token lands in and how many
windows it spans.  This is the standard packing used to build training
batches without padding waste; the per-shard formulation is the
100 TB-safe one — a single global prefix sum would serialize into one
partition, whereas real pipelines pack within each output shard/file
independently (shards are written by independent workers anyway).

Everything is a partitioned window aggregation (`SUM ... ROWS UNBOUNDED
PRECEDING`): one shuffle on the shard key, external-sortable, no UDF,
no driver state.  The DuckDB oracle replays the identical cumulative
arithmetic (q57).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    df: DataFrame,
    order_col: str,
    token_col: str | Column,
    capacity: int,
    shard_col: str | Column | None = None,
    out_window: str = "window_id",
    out_spans: str = "spans",
) -> DataFrame:
    """Assign each document its context-window id and span count.

    ``shard_col`` partitions the packing (default: everything in one
    shard — fine for tests, wrong at scale; pass a shard).  Zero-token
    documents occupy no width and report span 1 at their stream
    position.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    from sparkdiff.operators._util import reserve_columns

    reserve_columns(df, ("_tok", "_shard", "_cum"), "pack_concat_chunks")
    # the OUTPUT shard column has the fixed name "shard"; an input
    # column of that name (even the shard_col itself) would come out
    # duplicated and poison every downstream reference (the `_k`
    # temp-column bug class, on the output side)
    if "shard" in df.columns:
        raise ValueError(
            "pack_concat_chunks emits its shard as the fixed output "
            "column 'shard'; rename the input's 'shard' column first "
            "(e.g. 'shard_key') and pass it via shard_col"
        )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = (
        F.lit(0)
        if shard_col is None
        else (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
    )
    d = df.withColumn("_tok", tok.cast("long")).withColumn("_shard", shard)
    w = (
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = F.lit(float(capacity))
    d = d.withColumn("_cum", F.sum("_tok").over(w))
    start = F.floor((F.col("_cum") - F.col("_tok")) / cap).cast("long")
    end = F.floor((F.col("_cum") - F.lit(1)) / cap).cast("long")
    return (
        d.withColumn(out_window, start)
        .withColumn(
            out_spans,
            F.when(F.col("_tok") > 0, end - start + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long"),
        )
        .drop("_tok", "_cum")
        .withColumnRenamed("_shard", "shard")
    )
