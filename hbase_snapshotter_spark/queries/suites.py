"""Lane-union suite scaffolding (VERDICT r9 task 2).

The r8 consolidation pattern, factored: a SUITE is one registered query
whose rows are the NULL-padded union of several operator lanes — each
lane keeps its own typed columns (the other lanes' columns are typed
NULLs), a ``lane`` discriminator column leads, and the DuckDB oracle is
the identical UNION ALL over the lanes' standalone oracles.  Folding
lanes into one recorded key keeps every capability driver-hashed while
shrinking the rotation pool (the driver records at most 50 keys per
round — see ``registry.py``).

Both sides cast EVERY column (present or padded) to the lane spec's
declared DuckDB type, so cross-engine dtype alignment is by
construction, not by accident of each lane's expression types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DuckDB type name -> Spark cast target.
DUCK2SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "BOOLEAN": "boolean",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BLOB": "binary",
}

#: A lane's column spec: ordered ``(column_name, duckdb_type)`` pairs.
ColSpec = list[tuple[str, str]]


def _superset(specs: list[ColSpec]) -> ColSpec:
    out: ColSpec = []
    seen: set[str] = set()
    for spec in specs:
        for c, t in spec:
            if c not in seen:
                out.append((c, t))
                seen.add(c)
    return out


def union_lanes(lanes: list[tuple[str, DataFrame, ColSpec]]) -> DataFrame:
    """NULL-padded union of heterogeneous lane DataFrames: output
    schema is ``lane`` + the first-appearance-ordered union of every
    lane's columns, each cast to its declared type."""
    cols = _superset([spec for _, _, spec in lanes])
    parts = []
    for lane, df, spec in lanes:
        have = {c for c, _ in spec}
        sel = [F.lit(lane).alias("lane")]
        for c, t in cols:
            src = F.col(c) if c in have else F.lit(None)
            sel.append(src.cast(DUCK2SPARK[t.upper()]).alias(c))
        parts.append(df.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def union_lanes_sql(lanes: list[tuple[str, str, ColSpec]]) -> str:
    """The oracle-side mirror of :func:`union_lanes`: UNION ALL over
    the lanes' standalone oracle SQL, identically NULL-padded and
    cast."""
    cols = _superset([spec for _, _, spec in lanes])
    selects = []
    for lane, sql, spec in lanes:
        have = {c for c, _ in spec}
        exprs = [f"'{lane}' AS lane"]
        for c, t in cols:
            src = c if c in have else "NULL"
            exprs.append(f"CAST({src} AS {t}) AS {c}")
        body = sql.strip().rstrip(";")
        selects.append(
            f"SELECT {', '.join(exprs)}\nFROM (\n{body}\n)")
    return "\nUNION ALL\n".join(selects)
