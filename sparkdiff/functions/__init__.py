from sparkdiff.functions.canonical import (  # noqa: F401
    NULL_SENTINEL,
    SEP,
    canonical_col,
    canonical_columns,
    row_fingerprint,
)
