"""Schema declaration mirroring the reference's fixed, writer-declared model.

The reference declares exactly three column types — INT32/INT64/STRING — and a
per-column storage encoding bound at schema-declaration time
(reference ``cae/include/format.h:20-61``). Spark's Parquet writer picks
encodings automatically, so the encoding here is a *hint* recorded for parity
and surfaced by the metadata ``scan`` verb; the type maps to a non-nullable
``StructField`` (the reference has no NULLs, ``cae/README.md:135``).

Our engine is a superset: ``from_spark_type`` accepts the full Spark type
lattice so real-world tables (doubles, timestamps, arrays, binaries) flow
through the same declaration surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class ColumnType(Enum):
    """Reference primitive types (cae/include/format.h:20-24) + extensions."""

    INT32 = 0
    INT64 = 1
    STRING = 2
    # Extension types (absent from the reference, needed for testdata/scale):
    DOUBLE = 10
    TIMESTAMP = 11
    DATE = 12
    BOOLEAN = 13
    FLOAT_ARRAY = 14
    BINARY = 15


class EncodingType(Enum):
    """Storage-encoding hints (cae/include/format.h:27-32).

    Parquet applies its own (RLE_DICTIONARY, DELTA_BINARY_PACKED, ...);
    the hint controls writer tunables where possible (dictionary on/off).
    """

    PLAIN = 0
    RLE = 1
    DELTA = 2
    DICTIONARY = 3


# Legal type/encoding combinations enforced by the reference writer
# (cae/src/format.cpp:271-374): ints → PLAIN|RLE|DELTA, strings → PLAIN|DICT.
_LEGAL_ENCODINGS: dict[ColumnType, set[EncodingType]] = {
    ColumnType.INT32: {EncodingType.PLAIN, EncodingType.RLE, EncodingType.DELTA},
    ColumnType.INT64: {EncodingType.PLAIN, EncodingType.RLE, EncodingType.DELTA},
    ColumnType.STRING: {EncodingType.PLAIN, EncodingType.DICTIONARY},
}

_SPARK_TYPES: dict[ColumnType, T.DataType] = {
    ColumnType.INT32: T.IntegerType(),
    ColumnType.INT64: T.LongType(),
    ColumnType.STRING: T.StringType(),
    ColumnType.DOUBLE: T.DoubleType(),
    ColumnType.TIMESTAMP: T.TimestampType(),
    ColumnType.DATE: T.DateType(),
    ColumnType.BOOLEAN: T.BooleanType(),
    ColumnType.FLOAT_ARRAY: T.ArrayType(T.FloatType()),
    ColumnType.BINARY: T.BinaryType(),
}


@dataclass(frozen=True)
class ColumnSchema:
    """Mirror of the reference ColumnSchema {name, type, encoding}
    (cae/include/format.h:49-53)."""

    name: str
    type: ColumnType
    encoding: EncodingType = EncodingType.PLAIN

    def __post_init__(self) -> None:
        legal = _LEGAL_ENCODINGS.get(self.type)
        if legal is not None and self.encoding not in legal:
            raise ValueError(
                f"illegal encoding {self.encoding.name} for column "
                f"'{self.name}' of type {self.type.name}"
            )

    def to_spark_field(self, nullable: bool = False) -> T.StructField:
        return T.StructField(self.name, _SPARK_TYPES[self.type], nullable)


@dataclass
class Schema:
    """Ordered list of columns; lookup by name raises on miss, matching the
    reference (cae/src/format.cpp:17-29)."""

    columns: list[ColumnSchema] = field(default_factory=list)

    def add(
        self,
        name: str,
        type: ColumnType,
        encoding: EncodingType = EncodingType.PLAIN,
    ) -> "Schema":
        self.columns.append(ColumnSchema(name, type, encoding))
        return self

    def column(self, name: str) -> ColumnSchema:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(f"column not found in schema: {name!r}")

    def index_of(self, name: str) -> int:
        for i, c in enumerate(self.columns):
            if c.name == name:
                return i
        raise KeyError(f"column not found in schema: {name!r}")

    @property
    def names(self) -> list[str]:
        return [c.name for c in self.columns]

    def to_spark(self, nullable: bool = False) -> T.StructType:
        return T.StructType([c.to_spark_field(nullable) for c in self.columns])

    @classmethod
    def from_spark(cls, st: T.StructType) -> "Schema":
        """Best-effort inverse mapping for metadata display."""
        inv: dict[str, ColumnType] = {
            "integer": ColumnType.INT32,
            "long": ColumnType.INT64,
            "string": ColumnType.STRING,
            "double": ColumnType.DOUBLE,
            "timestamp": ColumnType.TIMESTAMP,
            "date": ColumnType.DATE,
            "boolean": ColumnType.BOOLEAN,
            "binary": ColumnType.BINARY,
        }
        cols = []
        for f in st.fields:
            tn = f.dataType.typeName()
            if tn == "array":
                ct = ColumnType.FLOAT_ARRAY
            elif tn in inv:
                ct = inv[tn]
            else:
                raise ValueError(f"unsupported spark type for schema mirror: {tn}")
            enc = (
                EncodingType.DICTIONARY
                if ct is ColumnType.STRING
                else EncodingType.PLAIN
            )
            cols.append(ColumnSchema(f.name, ct, enc))
        return cls(cols)
