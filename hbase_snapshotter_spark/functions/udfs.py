"""UDF / UDAF / UDTF surface (SURVEY §2.3 N18).

The engine's stance: built-in expressions first (everything in
``operators.*`` is JVM-side); this module is the vetted escape hatch —
Arrow-batched Pandas UDFs for numeric work the expression DSL can't
say, ``applyInPandas`` for per-group model-ish logic, and a Python UDTF
for table-generating transforms.  Row-at-a-time ``F.udf`` appears only
in tests as the anti-pattern baseline.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# ---- scalar Pandas UDF (Arrow-vectorized; ~10-100× row-at-a-time udf)


@F.pandas_udf(DoubleType())
def vector_norm(emb: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column — one numpy einsum over the
    whole stacked Arrow batch (a per-row .map would re-enter Python for
    every row, defeating the vectorization this module exists for)."""
    import numpy as np

    m = np.array(emb.tolist(), dtype=np.float64)
    return pd.Series(np.sqrt(np.einsum("ij,ij->i", m, m)))


# ---- grouped-agg Pandas UDF


@F.pandas_udf(DoubleType())
def trimmed_mean(v: pd.Series) -> float:
    """10%-trimmed mean — a UDAF no built-in aggregate expresses."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    inner = v[(v >= lo) & (v <= hi)]
    return float(inner.mean()) if len(inner) else float("nan")


# ---- applyInPandas (grouped map)


def zscore_by_group(df: DataFrame, group_col: str, value_col: str,
                    out_col: str = "zscore") -> DataFrame:
    """Per-group z-score via ``applyInPandas``.  Note: expressible as a
    window too — the grouped-map form exists for logic that genuinely
    needs pandas (model scoring, per-group fits); z-score keeps the
    example oracle-checkable."""
    from pyspark.sql.types import StructField, StructType

    # don't use df.schema.add(): it mutates the live schema object
    schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pdf.assign(**{out_col: z.round(4)})

    return df.groupBy(group_col).applyInPandas(normalize, schema)


# ---- Python UDTF (table function)


class _ExplodeTokensImpl:
    """Tokenize a string into (token, position) rows — a UDTF-shaped
    transform (built-in posexplode(split(...)) does this natively;
    the class demonstrates the registration surface)."""

    def eval(self, text: str):  # noqa: D102
        for i, tok in enumerate((text or "").split()):
            yield tok, i


def make_explode_tokens():
    """Build the UDTF AT CALL TIME, not import time: ``udtf()`` snapshots
    ``spark.sql.execution.pythonUDTF.arrow.enabled`` when it wraps the
    class, so a module-import-time decorator permanently pins the
    row-at-a-time BatchEvalPython path no matter what the session sets
    later.  Callers set the conf, then build."""
    from pyspark.sql.functions import udtf

    return udtf(_ExplodeTokensImpl, returnType="token: string, pos: int")


try:  # import-time probe only; the usable object comes from the factory
    from pyspark.sql.functions import udtf as _udtf_probe  # noqa: F401

    HAS_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 3.5
    HAS_UDTF = False
