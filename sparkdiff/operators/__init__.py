from sparkdiff.operators.diff import (  # noqa: F401
    TableDiff,
    cell_diff,
    diff_report,
    presence_diff,
    table_diff,
    table_metrics,
)
