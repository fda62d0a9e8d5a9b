"""Mergeable distinct-count sketch state (SURVEY §2.3 N48).

The aggregate-state mirror of the N25 latest-cells maintenance: a 100 TB
warehouse never re-counts distincts from scratch.  Per-group HLL
sketches (Spark 4's Apache DataSketches bindings — ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) are MATERIALIZED as binary
state (KBs per group, regardless of data volume), and advancing with a
delta is a register-max union:

- **associative + commutative** — ``union(sk(A), sk(B)) = sk(A ∪ B)``
  exactly (the union takes the per-register maximum, and a register's
  value depends only on the SET of hashed items that fed it);
- **idempotent under re-delivery** — re-unioning a delta's items
  changes no register (set semantics), so exactly-once sketch state
  falls out of at-least-once delivery, the same soundness argument as
  ``advance_latest_cells``;
- **deterministic** — same item set ⇒ bit-identical sketch ⇒ the
  merged-equals-full and advanced-equals-full invariants are exact
  EQUALITIES, not tolerances (driver-hash-checkable).

This is the Druid/Pinot/BigQuery materialized-sketch pattern: per-day /
per-partition sketch columns rolled up at query time at any grouping,
each merge reading KBs where the exact recount reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Materialized per-group sketch state: ``(*group_cols, sketch)``.
    One hash aggregation with map-side partials — the only pass that
    reads the data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col).alias("sketch"))


def advance_sketches(
    prior: DataFrame,
    delta: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Advance materialized sketch state with only the delta: sketch
    the delta (the only data-sized work) and union per group.  Groups
    new in the delta appear; untouched groups pass through; re-delivered
    delta rows are no-ops (register max).  State input is KBs per
    group, never the prior data."""
    fresh = distinct_sketches(delta, value_col, group_cols=group_cols)
    return (
        prior.select(*group_cols, "sketch")
        .unionByName(fresh)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def sketch_estimates(sketches: DataFrame, *, group_cols: list[str]) -> DataFrame:
    """``(*group_cols, estimate)`` — long estimates from the state."""
    return sketches.select(
        *group_cols,
        F.hll_sketch_estimate("sketch").alias("estimate"))


def theta_set_cardinalities(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Distinct-set ALGEBRA between two slices via theta sketches
    (N51): per group — ``n_a, n_b, n_union, n_intersection, n_a_only,
    n_b_only``.  HLL (N48) answers only cardinality; theta sketches
    (Apache DataSketches via Spark 4's ``theta_*``) support UNION,
    INTERSECTION, and DIFFERENCE over the sketch state — the "how many
    users churned / are new / are retained" questions across snapshot
    eras without ever materializing the sets.

    Each side is one hash aggregation into KB-sized sketch state;
    the algebra is per-group scalar functions on the joined sketches.
    Below the sketch's nominal capacity (2¹² retained hashes by
    default) a theta sketch IS the exact hashed set, so estimates are
    EXACT and deterministic — the fixture regime, where the driver
    hash checks them as values; above it they degrade gracefully,
    which is the 100 TB trade.  The envelope is MEASURED, not cited
    (``test_sketch_error_envelope_above_capacity``, three cardinality
    decades to 10⁶): per-side ±2%, union ±3% (a union inherits the
    smaller theta of its inputs), intersection/differences ±6% at 50%
    overlap (intersection error grows with disjointness and a
    difference compounds both inputs' errors — the documented
    DataSketches caveats; measured max 5.7% at n=10⁶).
    Groups present in only one slice get an empty-set other side."""
    a_sk = df_a.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("__a"))
    b_sk = df_b.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("__b"))
    joined = a_sk.join(b_sk, list(group_cols), "full_outer")
    est = F.theta_sketch_estimate

    def side(col):
        return F.when(F.col(col).isNull(), F.lit(0)).otherwise(est(F.col(col)))

    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()
    return joined.select(
        *group_cols,
        side("__a").alias("n_a"),
        side("__b").alias("n_b"),
        F.when(both, est(F.theta_union("__a", "__b")))
         .otherwise(side("__a") + side("__b")).alias("n_union"),
        F.when(both, est(F.theta_intersection("__a", "__b")))
         .otherwise(F.lit(0)).alias("n_intersection"),
        F.when(both, est(F.theta_difference("__a", "__b")))
         .otherwise(side("__a")).alias("n_a_only"),
        F.when(both, est(F.theta_difference("__b", "__a")))
         .otherwise(side("__b")).alias("n_b_only"),
    )
