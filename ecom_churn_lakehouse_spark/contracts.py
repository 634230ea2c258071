"""JSON data contracts → StructType compiler + validation.

The reference declares per-stage contracts as JSON files
(``data/contracts/{bronze,silver,gold}/*.v1.json``) with required
columns, types, grain, allowed values, and quality rules; enforcement
is split across stages (SURVEY.md §1.3). Here one loader serves all
stages: compile the declared schema, validate an incoming DataFrame's
shape (names + types), and expose grain/allowed-values/quality-rules
to the pipeline drivers.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ecom_churn_lakehouse_spark.versioning import canonical_hash

__all__ = ["Contract", "SchemaMismatch"]

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
}


class SchemaMismatch(ValueError):
    """Raised when a DataFrame violates its contract (job must abort —
    bronze behavior, orders_to_bronze.py:45-60)."""


@dataclass(frozen=True)
class Contract:
    name: str
    version: str
    columns: list[dict[str, Any]]  # {name, type, nullable}
    grain: list[str]
    allowed_values: dict[str, list[Any]]
    quality_rules: list[dict[str, Any]]
    raw: dict[str, Any]

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Contract:
        return cls(
            name=d["name"],
            version=str(d.get("version", "v1")),
            columns=d["columns"],
            grain=list(d.get("grain", [])),
            allowed_values=dict(d.get("allowed_values", {})),
            quality_rules=list(d.get("quality_rules", [])),
            raw=d,
        )

    @classmethod
    def load(cls, path: str) -> Contract:
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @property
    def contract_hash(self) -> str:
        """Becomes ``_schema_version`` / ``_feature_version``
        (customer_features_daily.py:243)."""
        return canonical_hash(self.raw)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    c["name"], _TYPE_MAP[c["type"]], bool(c.get("nullable", True))
                )
                for c in self.columns
            ]
        )

    def validate(self, df: DataFrame, allow_extra: bool = False) -> None:
        """Name+type validation (bronze pattern; stricter than the
        reference, which tolerated extras despite its contract —
        SURVEY §7.5)."""
        actual = {f.name: f.dataType for f in df.schema.fields}
        problems: list[str] = []
        for c in self.columns:
            want = _TYPE_MAP[c["type"]]
            if c["name"] not in actual:
                problems.append(f"missing column {c['name']!r}")
            elif actual[c["name"]] != want:
                problems.append(
                    f"column {c['name']!r}: expected {want.simpleString()}, "
                    f"got {actual[c['name']].simpleString()}"
                )
        if not allow_extra:
            declared = {c["name"] for c in self.columns}
            extras = [n for n in actual if n not in declared]
            if extras:
                problems.append(f"unexpected extra columns {extras}")
        if problems:
            raise SchemaMismatch(f"contract {self.name}: " + "; ".join(problems))
