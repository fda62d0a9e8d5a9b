"""MySQL column-DDL type parser and MySQL→Spark type mapping.

Re-implements (from scratch, in Python) the behavior of the reference's
parser-combinator grammar ``DataTypeParser.scala:10-65`` and the type
mapping ``Schema.scala:71-85``.  Driver-side only — runs once per column
while building a snapshot schema, never on the data path.

Grammar recognized (case-insensitive), per ``DataTypeParser.scala:16-56``::

    type      := TYPENAME [ '(' arguments ')' ] qualifier* attribute*
    arguments := quoted-string-list        (ENUM / SET)
               | INT [ ',' INT ]           (precision / scale)
    qualifier := UNSIGNED | ZEROFILL | BINARY
    attribute := CHARACTER SET <value> | COLLATE <value>

Two mapping modes:

- ``compat`` (default) reproduces the reference exactly, including its
  deliberate lossy choices: BIGINT/DECIMAL/NUMERIC/FLOAT/DOUBLE/REAL all
  → DoubleType (``Schema.scala:77``), DATE left unmapped → StringType
  (``Schema.scala:79-80``, Hive-Parquet TODO), everything unknown →
  StringType (``README.md:85-86``).
- ``strict`` fixes those gaps on modern Spark: DECIMAL(p,s) →
  DecimalType, BIGINT → LongType (unsigned BIGINT → DecimalType(20,0)),
  FLOAT → FloatType, DATE → DateType.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

# The 32 typenames the reference grammar recognizes (DataTypeParser.scala:12).
TYPENAMES = (
    "TINYINT SMALLINT MEDIUMINT INTEGER INT BIGINT NUMERIC DECIMAL FLOAT "
    "DOUBLE REAL BIT DATETIME TIMESTAMP TIME YEAR DATE TINYBLOB MEDIUMBLOB "
    "LONGBLOB BLOB TINYTEXT MEDIUMTEXT LONGTEXT TEXT VARCHAR CHAR VARBINARY "
    "BINARY ENUM SET JSON"
).split()

QUALIFIERS = ("UNSIGNED", "ZEROFILL", "BINARY")
ATTRIBUTE_KEYS = ("CHARACTER SET", "COLLATE")


@dataclass
class MySQLDataType:
    """Parsed MySQL column type (mirror of ``DataTypeParser.scala:8``)."""

    typename: str
    enumeration: list[str] = field(default_factory=list)
    precision: tuple[int, int | None] | None = None
    qualifiers: list[str] = field(default_factory=list)
    attributes: dict[str, str] = field(default_factory=dict)

    @property
    def is_unsigned(self) -> bool:
        return "UNSIGNED" in self.qualifiers


class MySQLTypeParseError(ValueError):
    pass


# Longest-first so INT does not shadow INTEGER, SET does not shadow SMALLINT…
_TYPENAME_RE = re.compile(
    r"\s*(" + "|".join(sorted(TYPENAMES, key=len, reverse=True)) + r")\b",
    re.IGNORECASE,
)
_PRECISION_RE = re.compile(r"\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)")
_QUOTED_RE = re.compile(r"""\s*(?:'([^']*)'|"([^"]*)")\s*""")
_QUALIFIER_RE = re.compile(
    r"\s+(" + "|".join(QUALIFIERS) + r")\b", re.IGNORECASE
)
_ATTR_RE = re.compile(
    r"\s+(CHARACTER\s+SET|COLLATE)\s+(?:'([^']*)'|\"([^\"]*)\"|(\S+))",
    re.IGNORECASE,
)


def _parse_value_list(s: str, pos: int) -> tuple[list[str], int]:
    """Parse ``('a', 'b', …)`` starting at ``pos``; returns (values, newpos)."""
    m = re.compile(r"\s*\(").match(s, pos)
    if not m:
        raise MySQLTypeParseError(f"expected '(' at {pos} in {s!r}")
    pos = m.end()
    values: list[str] = []
    while True:
        m = _QUOTED_RE.match(s, pos)
        if not m:
            raise MySQLTypeParseError(f"expected quoted value at {pos} in {s!r}")
        values.append(m.group(1) if m.group(1) is not None else m.group(2))
        pos = m.end()
        if pos < len(s) and s[pos] == ",":
            pos += 1
            continue
        m = re.compile(r"\s*\)").match(s, pos)
        if not m:
            raise MySQLTypeParseError(f"expected ')' at {pos} in {s!r}")
        return values, m.end()


def parse_mysql_type(expr: str) -> MySQLDataType:
    """Parse a MySQL column-type DDL string.

    >>> parse_mysql_type("int(10) unsigned").qualifiers
    ['UNSIGNED']
    """
    m = _TYPENAME_RE.match(expr)
    if not m:
        raise MySQLTypeParseError(f"unrecognized MySQL type: {expr!r}")
    typename = m.group(1).upper()
    pos = m.end()
    enumeration: list[str] = []
    precision: tuple[int, int | None] | None = None

    if typename in ("ENUM", "SET"):
        if re.compile(r"\s*\(").match(expr, pos):
            enumeration, pos = _parse_value_list(expr, pos)
    else:
        pm = _PRECISION_RE.match(expr, pos)
        if pm:
            precision = (int(pm.group(1)), int(pm.group(2)) if pm.group(2) else None)
            pos = pm.end()

    qualifiers: list[str] = []
    attributes: dict[str, str] = {}
    while pos < len(expr):
        qm = _QUALIFIER_RE.match(expr, pos)
        if qm:
            qualifiers.append(qm.group(1).upper())
            pos = qm.end()
            continue
        am = _ATTR_RE.match(expr, pos)
        if am:
            key = re.sub(r"\s+", " ", am.group(1).upper())
            attributes[key] = next(g for g in am.groups()[1:] if g is not None)
            pos = am.end()
            continue
        if expr[pos:].strip() == "":
            break
        raise MySQLTypeParseError(f"trailing garbage at {pos} in {expr!r}")

    return MySQLDataType(typename, enumeration, precision, qualifiers, attributes)


_INT_TYPES = {"TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER"}
_COMPAT_DOUBLE = {"BIGINT", "NUMERIC", "DECIMAL", "FLOAT", "DOUBLE", "REAL"}


def mysql_to_spark_type(expr: str | MySQLDataType, *, mode: str = "compat") -> DataType:
    """Map a MySQL DDL type to a Spark SQL type.

    ``mode='compat'`` reproduces ``Schema.scala:71-85`` bit-for-bit;
    ``mode='strict'`` uses lossless modern-Spark types (see module doc).
    """
    t = parse_mysql_type(expr) if isinstance(expr, str) else expr
    name = t.typename
    if name in _INT_TYPES:
        return LongType() if t.is_unsigned else IntegerType()
    if name == "TIMESTAMP":
        return TimestampType()
    if mode == "compat":
        if name in _COMPAT_DOUBLE:
            return DoubleType()
        # DATE deliberately unmapped in the reference (Schema.scala:79-80)
        return StringType()
    # strict mode
    if name in ("DECIMAL", "NUMERIC"):
        p, s = t.precision or (10, 0)
        return DecimalType(p, s or 0)
    if name == "BIGINT":
        return DecimalType(20, 0) if t.is_unsigned else LongType()
    if name == "FLOAT":
        return FloatType()
    if name in ("DOUBLE", "REAL"):
        return DoubleType()
    if name == "DATE":
        return DateType()
    if name == "DATETIME":
        return TimestampType()
    return StringType()
