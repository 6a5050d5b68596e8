"""JSON schema declaration → Spark StructType.

Mirrors the semantics of the reference's schema loader
(`/root/reference/src/main/java/com/rbccm/database/tools/SchemaLoader.java:30-92`):

- JSON shape: ``{"name": ..., "fields": [{"name", "type", "repetition"?,
  "logicalType"?, "precision"?, "scale"?}]}``
- physical types: exactly INT32 / INT64 / BINARY (case-insensitive);
  anything else raises (SchemaLoader.java:55-67)
- logical annotations: STRING, DATE (on INT32), TIMESTAMP_MICROS (on INT64,
  not UTC-adjusted), DECIMAL(precision, scale) (on BINARY); unknown logical
  types are warned and ignored (SchemaLoader.java:69-86)
- repetition REQUIRED/OPTIONAL, default OPTIONAL, invalid values warn and
  fall back to OPTIONAL (SchemaLoader.java:41, :46-52)

Spark mapping (SURVEY.md §1.2): INT32→Integer (DATE→Date), INT64→Long
(TIMESTAMP_MICROS→TimestampNTZ: exact match for isAdjustedToUTC=false),
BINARY+STRING→String, BINARY+DECIMAL→Decimal(p, s).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass

from pyspark.sql import types as T

logger = logging.getLogger(__name__)

PHYSICAL_TYPES = ("INT32", "INT64", "BINARY")
LOGICAL_TYPES = ("STRING", "DATE", "TIMESTAMP_MICROS", "DECIMAL")


@dataclass(frozen=True)
class FieldSpec:
    """One declared column: physical + logical type, nullability, decimal dims."""

    name: str
    physical: str  # INT32 | INT64 | BINARY
    logical: str | None = None  # STRING | DATE | TIMESTAMP_MICROS | DECIMAL | None
    precision: int = 0
    scale: int = 0
    required: bool = False

    def spark_type(self) -> T.DataType:
        if self.physical == "INT32":
            return T.DateType() if self.logical == "DATE" else T.IntegerType()
        if self.physical == "INT64":
            if self.logical == "TIMESTAMP_MICROS":
                return T.TimestampNTZType()
            return T.LongType()
        # BINARY
        if self.logical == "DECIMAL":
            return T.DecimalType(self.precision, self.scale)
        # STRING, or unknown/absent logical type treated as string payload
        return T.StringType()


def parse_field(field_json: dict) -> FieldSpec:
    name = field_json["name"]
    physical = str(field_json["type"]).upper()
    if physical not in PHYSICAL_TYPES:
        raise ValueError(f"Unsupported type: {field_json['type']} (field {name!r})")

    repetition = str(field_json.get("repetition", "OPTIONAL")).upper()
    if repetition not in ("REQUIRED", "OPTIONAL"):
        logger.warning(
            "Invalid repetition %r for field %r, defaulting to OPTIONAL", repetition, name
        )
        repetition = "OPTIONAL"

    logical = field_json.get("logicalType")
    if logical is not None:
        logical = str(logical).upper()
        if logical not in LOGICAL_TYPES:
            logger.warning("Unsupported logical type: %s for field: %s", logical, name)
            logical = None

    return FieldSpec(
        name=name,
        physical=physical,
        logical=logical,
        precision=int(field_json.get("precision", 0)),
        scale=int(field_json.get("scale", 0)),
        required=repetition == "REQUIRED",
    )


def parse_schema(schema_json: dict) -> list[FieldSpec]:
    fields = schema_json.get("fields")
    if not isinstance(fields, list):
        raise ValueError("Schema must contain a 'fields' array")
    return [parse_field(f) for f in fields]


def load_schema(path: str) -> list[FieldSpec]:
    with open(path) as fh:
        return parse_schema(json.load(fh))


def to_struct_type(specs: list[FieldSpec]) -> T.StructType:
    return T.StructType(
        [T.StructField(s.name, s.spark_type(), nullable=not s.required) for s in specs]
    )


def raw_struct_type(specs: list[FieldSpec]) -> T.StructType:
    """All-string schema for the positional first-pass CSV read."""
    return T.StructType([T.StructField(s.name, T.StringType(), True) for s in specs])
