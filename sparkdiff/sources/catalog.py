"""Schema catalog (S5, SURVEY §1.3): table/column metadata driving macro
expansion and explicit StructTypes.

The reference loads two CSVs (``schema_table.csv``: table name → id;
``schema_column.csv``: per-table column name + numeric type id) with a
memo cache and a prefix-fallback lookup for staged table names
(``tools/script_expansion_tool.py:36-110``).  This port keeps the exact
lookup semantics (case-insensitive, ``udm_sf_|udm_s_|delta_stage_|
delta_udm_`` prefix stripping) and adds a constructor from live Spark
schemas so the catalog can also be derived from the warehouse itself.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: type-id → name map (``script_expansion_tool.py:55-65``)
TYPE_ID_MAP = {
    "0": "INTEGER",
    "1": "LONG",
    "2": "STRING",
    "3": "DOUBLE",
    "4": "BOOLEAN",
    "5": "DECIMAL",
}

FALLBACK_PREFIXES = ("udm_sf_", "udm_s_", "delta_stage_", "delta_udm_")

_SPARK_TYPE_NAMES = {
    "INTEGER": T.IntegerType(),
    "LONG": T.LongType(),
    "STRING": T.StringType(),
    "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "DECIMAL": T.DecimalType(18, 4),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
}


@dataclass(frozen=True)
class ColumnMeta:
    name: str
    type: str  # one of _SPARK_TYPE_NAMES keys


class SchemaCatalog:
    def __init__(
        self,
        tables: dict[str, str],
        columns: dict[str, list[ColumnMeta]],
    ) -> None:
        self._tables = {k.lower(): v for k, v in tables.items()}
        self._columns = columns

    @classmethod
    def from_csv(cls, metadata_dir: str) -> "SchemaCatalog":
        """Load the reference's catalog CSV layout (FIXTURES.md §5)."""
        tables: dict[str, str] = {}
        with open(os.path.join(metadata_dir, "schema_table.csv")) as f:
            for row in csv.DictReader(f):
                name = (row.get("name") or "").lower()
                if name:
                    tables[name] = (row.get("table_id") or "").lower()
        columns: dict[str, list[ColumnMeta]] = {}
        with open(os.path.join(metadata_dir, "schema_column.csv")) as f:
            for row in csv.DictReader(f):
                tid = (row.get("tableId") or "").lower()
                cname = row.get("name") or ""
                if tid and cname:
                    columns.setdefault(tid, []).append(
                        ColumnMeta(
                            cname, TYPE_ID_MAP.get(row.get("type", ""), "STRING")
                        )
                    )
        return cls(tables, columns)

    @classmethod
    def from_spark(cls, dfs: dict[str, DataFrame]) -> "SchemaCatalog":
        """Derive the catalog from live DataFrame schemas."""
        tables = {name: name for name in dfs}
        columns: dict[str, list[ColumnMeta]] = {}
        for name, df in dfs.items():
            cols = []
            for f in df.schema.fields:
                dt = f.dataType
                if isinstance(dt, (T.DoubleType, T.FloatType)):
                    tn = "DOUBLE"
                elif isinstance(dt, T.DecimalType):
                    tn = "DECIMAL"
                elif isinstance(dt, T.BooleanType):
                    tn = "BOOLEAN"
                elif isinstance(dt, T.IntegerType):
                    tn = "INTEGER"
                elif isinstance(dt, (T.LongType, T.ShortType)):
                    tn = "LONG"
                elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                    tn = "TIMESTAMP"
                elif isinstance(dt, T.DateType):
                    tn = "DATE"
                else:
                    tn = "STRING"
                cols.append(ColumnMeta(f.name, tn))
            columns[name] = cols
        return cls(tables, columns)

    def get_columns_for_table(self, table_name: str) -> list[ColumnMeta]:
        """Direct lookup, then prefix-stripped fallback
        (``script_expansion_tool.py:87-110``); raises if unknown."""
        key = table_name.lower()
        tid = self._tables.get(key)
        if tid is not None and tid in self._columns:
            return self._columns[tid]
        for prefix in FALLBACK_PREFIXES:
            if key.startswith(prefix):
                tid = self._tables.get(key[len(prefix):])
                if tid is not None and tid in self._columns:
                    return self._columns[tid]
        raise IOError(f"Schema definition for table '{table_name}' not found")

    def to_struct_type(self, table_name: str) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, _SPARK_TYPE_NAMES[c.type], True)
                for c in self.get_columns_for_table(table_name)
            ]
        )
