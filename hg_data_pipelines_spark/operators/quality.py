"""Data-quality operators: one-pass column profiling and constraint checks.

The ETL-gate layer a production pipeline runs between landing and
publishing a table (the deequ/great-expectations role, DataFrame-native).

Scale design: ``profile`` computes every column's statistics in ONE
aggregation pass over the table — a single scan, partial-aggregated
below one exchange, output one row. ``check_constraints`` evaluates all
rules in the same single pass and returns per-rule violation counts;
callers decide whether to fail the pipeline. Neither collects data rows
to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile in one aggregation pass.

    Returns one row per column: count, null count, distinct count
    (HLL-approximate by default — the 100 TB path; ``exact_distinct=True``
    for the oracle-comparable exact form), and (numeric columns)
    min/max/mean. The wide single-row aggregate is unpivoted to rows
    driver-free, so the output is a small (n_columns)-row DataFrame
    regardless of table size.
    """
    cols = columns or [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs: list[Column] = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(distinct(c).alias(f"ad_{c}"))
        if isinstance(by_name[c], _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
            aggs.append(F.avg(c).cast("double").alias(f"av_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        is_num = isinstance(by_name[c], _NUMERIC)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_total").alias("n_rows"),
                (F.col("_total") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"ad_{c}").alias("n_distinct"),
                (F.col(f"mn_{c}") if is_num else F.lit(None).cast("double")).alias("min_value"),
                (F.col(f"mx_{c}") if is_num else F.lit(None).cast("double")).alias("max_value"),
                (F.col(f"av_{c}") if is_num else F.lit(None).cast("double")).alias("mean_value"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@dataclass(frozen=True)
class Constraint:
    """A named row-level predicate that must hold for every row."""

    name: str
    predicate: Column


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints in one pass → (constraint, n_rows,
    n_violations, passed). A violation is a row where the predicate is
    false OR null (SQL three-valued logic must not let nulls slip through
    a gate).
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for con in constraints:
        aggs.append(
            # coalesce: SUM over zero rows is NULL — an empty table must
            # report 0 violations / passed, not a NULL gate
            F.coalesce(
                F.sum(
                    F.when(con.predicate.isNull() | ~con.predicate, 1).otherwise(0)
                ),
                F.lit(0),
            ).alias(f"v_{con.name}")
        )
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col("_total").alias("n_rows"),
            F.col(f"v_{c.name}").alias("n_violations"),
            (F.col(f"v_{c.name}") == 0).alias("passed"),
        )
        for c in constraints
    ]
    return wide.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


def require(df: DataFrame, constraints: list[Constraint]) -> None:
    """Gate form: raise ValueError listing every failed constraint."""
    failed = [
        (r["constraint"], r["n_violations"])
        for r in check_constraints(df, constraints).collect()
        if not r["passed"]
    ]
    if failed:
        detail = ", ".join(f"{n} ({v} rows)" for n, v in failed)
        raise ValueError(f"constraint violations: {detail}")


def observed_filter(df, cond, name: str = "gate"):
    """Filter with free pass/fail metrics via the Observation API.

    Returns ``(filtered_df, observation)``: the observation's counters
    (``n_input``, ``n_pass``) are collected DURING the same action that
    consumes the filtered result — at 100 TB a separate ``count()`` for
    gate metrics re-scans the table; observe() rides the existing pass
    for free. Read ``observation.get`` only after an action has run.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(cond.cast("long")).alias("n_pass"),
    )
    return observed.filter(cond), obs


@dataclass(frozen=True)
class ForeignKey:
    """A named FK relation: every non-null ``fk`` value in ``fact`` must
    exist as ``pk`` in ``dim``. NULL FKs are optional references, not
    orphans (matching ANSI FK semantics)."""

    name: str
    fact: DataFrame
    fk: str
    dim: DataFrame
    pk: str


def referential_integrity(relations: list[ForeignKey]) -> DataFrame:
    """Orphan audit over FK relations → (relation, n_checked, n_orphans,
    passed), one row per relation.

    Scale shape: relations sharing a fact DataFrame share ONE scan — the
    distinct dim-key sets left-join onto the fact (broadcast for small
    dims; one key shuffle each for fact→fact), presence flags accumulate,
    and a single aggregation emits every relation's counts. A fact with k
    FK columns costs one scan + k key joins, not 2k scans. Only COUNTs
    cross to the driver; fact rows are never collected.
    """
    if not relations:
        raise ValueError("referential_integrity: no relations given")
    by_fact: dict[int, list[tuple[int, ForeignKey]]] = {}
    for idx, rel in enumerate(relations):
        by_fact.setdefault(id(rel.fact), []).append((idx, rel))

    parts: list[tuple[int, DataFrame]] = []
    for group in by_fact.values():
        fact = group[0][1].fact
        enriched = fact
        for idx, rel in group:
            dim_keys = rel.dim.select(
                F.col(rel.pk).alias(f"_pk{idx}")
            ).distinct()
            enriched = enriched.join(
                dim_keys,
                F.col(rel.fk) == F.col(f"_pk{idx}"),
                "left",
            )
        aggs = []
        for idx, rel in group:
            fk_present = F.col(rel.fk).isNotNull()
            aggs.append(
                F.coalesce(F.sum(fk_present.cast("long")), F.lit(0)).alias(
                    f"_c{idx}"
                )
            )
            aggs.append(
                F.coalesce(
                    F.sum(
                        (fk_present & F.col(f"_pk{idx}").isNull()).cast("long")
                    ),
                    F.lit(0),
                ).alias(f"_o{idx}")
            )
        wide = enriched.agg(*aggs)
        rows = [
            F.struct(
                F.lit(rel.name).alias("relation"),
                F.col(f"_c{idx}").alias("n_checked"),
                F.col(f"_o{idx}").alias("n_orphans"),
                (F.col(f"_o{idx}") == 0).alias("passed"),
            )
            for idx, rel in group
        ]
        parts.append(
            (
                group[0][0],
                wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*"),
            )
        )
    parts.sort(key=lambda t: t[0])
    out = parts[0][1]
    for _, p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_uniqueness(
    checks: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Table-level UNIQUENESS audit → (key, n_rows, n_distinct,
    n_dup_rows, passed) per (name, df, key_cols) check — the constraint
    class row-level predicates (DQ2) can't express. One count-distinct
    aggregation per check (two shuffles: partial distinct + final);
    ``n_dup_rows`` counts rows beyond the first per duplicated key, so
    ``n_rows - n_dup_rows == n_distinct`` always holds.

    NULL semantics: a key tuple containing NULLs counts as a real
    (distinct) key — two all-NULL keys are duplicates of each other —
    matching SQL's ``COUNT(*) FROM (SELECT DISTINCT key...)`` form. The
    multi-arg ``count_distinct(c1, c2)`` would instead SKIP any row with
    a NULL in ANY key column (ANSI aggregate-DISTINCT semantics) and
    misreport genuinely-unique nullable keys as duplicated; wrapping the
    key in a single non-null struct restores tuple-level counting.
    """
    if not checks:
        raise ValueError("check_uniqueness: no checks given")
    parts = []
    for name, df, key_cols in checks:
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(
                F.struct(*[F.col(c) for c in key_cols])
            ).alias("n_distinct"),
        ).select(
            F.lit(name).alias("key"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
            (F.col("n_rows") == F.col("n_distinct")).alias("passed"),
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
