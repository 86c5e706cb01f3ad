"""Shared operator plumbing."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def reserve_columns(df: DataFrame, names: Iterable[str], op: str) -> None:
    """Raise if the caller's frame already carries a column an operator
    uses as an internal temporary.  Operators that decorate a
    CALLER-SUPPLIED frame with ``_x`` working columns and later
    ``drop`` them would otherwise silently overwrite — and then
    delete — the caller's data of the same name (the bloom_probe
    ``_k`` bug class, ADVICE r6)."""
    clash = set(names) & set(df.columns)
    if clash:
        raise ValueError(
            f"{op} reserves internal column names {sorted(clash)}; "
            "rename or drop them on the input frame first"
        )
