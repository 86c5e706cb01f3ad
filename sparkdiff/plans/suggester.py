"""Discrepancy-suggestion stage (SURVEY §3.1 step 3) — deterministic
core of ``tools/discrepancy_suggester_tool.py``.

For each diff-flagged column, locate its first word-boundary occurrence
in each paired workload script (P8, ``:146-148``) and extract a ±N-line
context window (P13, ``:85-93``).  The reference then sends each
(column, snippet-pair) to OpenAI; here the LLM is an optional callback
on top of this DataFrame — the data plane stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def suggest_snippets(
    spark: SparkSession,
    diff_columns: DataFrame,
    script_pairs: dict[str, tuple[str | None, str | None]],
    window_lines: int = 50,
) -> DataFrame:
    """``(column_name, suffix, side, first_line, snippet)`` per flagged
    column × script where the column appears.

    ``diff_columns`` needs a ``column_name`` column (e.g. the output of
    ``diff_report``/``cell_diff``); scripts are exploded to lines, hits
    found with a case-insensitive word-boundary regex, and the ±N-line
    window reassembled — all as one plan (scripts broadcast: tiny side).
    """
    rows = []
    for suffix, (hive, sf) in script_pairs.items():
        if hive is not None:
            rows.append((suffix, "hive", hive))
        if sf is not None:
            rows.append((suffix, "sf", sf))
    scripts = spark.createDataFrame(rows, "suffix string, side string, content string")
    lines = scripts.select(
        "suffix",
        "side",
        F.posexplode(F.split("content", "\n")).alias("line_no", "line"),
    )
    cols = diff_columns.select("column_name").distinct()
    hits = (
        lines.join(F.broadcast(cols))
        .filter(
            F.regexp_like(
                F.col("line"),
                # quote the column name so regex metacharacters in quoted
                # identifiers ('$', '(', '+', ...) match literally —
                # java.util.regex.Pattern.quote semantics: wrap in \Q...\E
                # and split any embedded \E out of the quoted run.  Word
                # edges use lookarounds, not \b: a \b next to a
                # non-word boundary character (e.g. a name ending in
                # ')') can never match.
                F.concat(
                    F.lit("(?i)(?<!\\w)\\Q"),
                    F.replace(
                        F.col("column_name"), F.lit("\\E"), F.lit("\\E\\\\E\\Q")
                    ),
                    F.lit("\\E(?!\\w)"),
                ),
            )
        )
        .groupBy("column_name", "suffix", "side")
        .agg(F.min("line_no").alias("first_line"))
    )
    # Window reassembly: slice the ±N lines straight out of the script
    # content — one array slice per hit, NO hits x lines join fan-out
    # (the earlier shape re-joined every hit against every line of its
    # script, which is quadratic when hit columns are dense in a long
    # script).  slice() is 1-based; line_no/first_line are 0-based.
    start0 = F.greatest(F.lit(0), F.col("first_line") - window_lines)
    length = F.col("first_line") + window_lines - start0 + 1
    windowed = hits.join(
        F.broadcast(scripts), ["suffix", "side"]
    ).select(
        "column_name",
        "suffix",
        "side",
        "first_line",
        F.concat_ws(
            "\n", F.slice(F.split("content", "\n"), start0 + 1, length)
        ).alias("snippet"),
    )
    return windowed
