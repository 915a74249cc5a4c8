"""Z-order (Morton) clustering for multi-dimensional data skipping.

A date-partitioned table prunes on one dimension; real query mixes filter
on several (user AND time, region AND price). Z-ordering interleaves the
bits of N normalized columns into one integer key, so sorting by that key
places rows that are close in EVERY dimension into the same files — and
parquet's per-file/row-group min-max stats then prune multi-dimensional
range predicates that a single-column sort cannot. This is the layout
move behind Delta's OPTIMIZE ZORDER BY; at 100 TB it turns "scan the
month" into "scan the handful of files whose user-range intersects".

Shapes: normalization is one tiny min/max aggregate broadcast back onto
the scan (no window, no shuffle); the z-value itself is pure integer bit
arithmetic inside whole-stage codegen; the write is one
repartitionByRange(z) — a sampled range exchange, the same cost as any
global sort write — plus sortWithinPartitions, which spills instead of
OOMing on oversized partitions.

Everything here is exact integer arithmetic on already-aggregated
bounds, so z-values are engine-portable (the declared query's DuckDB
oracle reproduces them bit-for-bit from the same scalar subqueries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BITS = 16


def zorder_bit_expr(
    scaled_cols: list[str], bits: int = DEFAULT_BITS
) -> F.Column:
    """Interleave ``bits`` low bits of each (already-normalized) integer
    column: bit i of column j lands at position i * n_cols + j. A sum of
    shifted single-bit masks — whole-stage codegen, no UDF."""
    n = len(scaled_cols)
    terms = []
    for j, c in enumerate(scaled_cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return F.expr(" + ".join(terms)).cast("bigint")


def scale_to_grid(
    col: str,
    lo: str,
    hi: str,
    bits: int = DEFAULT_BITS,
    integral: bool = True,
) -> F.Column:
    """Map ``col`` linearly from [lo, hi] onto the integer grid
    [0, 2^bits): floor((x - lo) * (2^bits - 1) / (hi - lo)). Integral
    columns use all-BIGINT arithmetic (multiply before divide) so the
    result is exact and engine-portable — the form the S17 oracle checks;
    float/decimal columns quantize through double arithmetic (layout-only
    precision, which is all a clustering key needs). A degenerate
    hi == lo column maps to 0.

    Integral ranges wider than 2^62 / top (~2^46 at 16 bits — e.g.
    epoch-micro columns spanning >~4.5 years) would overflow the
    multiply-before-divide BIGINT product under ANSI; those fall back to
    the double path at runtime via a range-width CASE. Doubles lose
    low-bit exactness, but a clustering key only needs the grid cell."""
    top = (1 << bits) - 1
    if integral:
        wide = (1 << 62) // top
        return F.expr(
            f"CAST(CASE WHEN {hi} = {lo} THEN 0"
            f" WHEN (CAST({hi} AS DOUBLE) - {lo}) > {wide} THEN"
            f" CAST((CAST({col} AS DOUBLE) - {lo}) / ({hi} - {lo})"
            f" * {top} AS BIGINT)"
            f" ELSE (({col} - {lo}) * {top}) DIV ({hi} - {lo})"
            f" END AS BIGINT)"
        )
    return F.expr(
        f"CAST(CASE WHEN {hi} = {lo} THEN 0.0 ELSE"
        f" (CAST({col} AS DOUBLE) - {lo}) / ({hi} - {lo}) * {top}"
        f" END AS BIGINT)"
    )


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    key_col: str = "_z",
) -> DataFrame:
    """Append the Morton key over integer-valued ``cols``.

    Bounds come from ONE aggregate broadcast-cross-joined back (the same
    shape DQ3 uses for its grand total) — no global window touches the
    table. Integral columns (incl. timestamps cast to epoch upstream)
    use the exact portable grid; float/decimal columns the double path.
    2+ columns, and n_cols * bits must stay under 63 so the key fits a
    BIGINT.
    """
    from pyspark.sql import types as T

    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows BIGINT")
    is_int = {
        c: isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        )
        for c in cols
    }
    bounds = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("bigint" if is_int[c] else "double").alias(f"_lo_{c}"),
                F.max(c).cast("bigint" if is_int[c] else "double").alias(f"_hi_{c}"),
            )
        ]
    )
    scaled = [f"_s_{c}" for c in cols]
    out = df.crossJoin(F.broadcast(bounds))
    for c, s in zip(cols, scaled):
        out = out.withColumn(
            s, scale_to_grid(c, f"_lo_{c}", f"_hi_{c}", bits, is_int[c])
        )
    return out.withColumn(key_col, zorder_bit_expr(scaled, bits)).drop(
        *scaled, *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the Morton
    key of ``cols`` — repartitionByRange on the key (sampled range
    exchange), sorted within each partition, key dropped on write."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --------------------------------------------------------------------------
# Hilbert curve: Z-order's jumps between quadrant boundaries leave a few
# files straddling distant rectangles; the Hilbert curve visits every
# grid cell in a single unbroken path (consecutive indices are always
# grid neighbors), so per-file bounding boxes are as tight as a
# space-filling curve can make them — the layout behind Databricks
# liquid clustering. The standard xy→d bit walk (per-bit quadrant
# detect + reflect/swap rotation) unrolls into `bits` chained integer
# CASE steps — whole-stage codegen, engine-portable, oracle-checkable.
# 2-D only (the classical construction); use Z-order for 3+ columns.
# --------------------------------------------------------------------------


def hilbert_step_exprs(
    s: int, x: str, y: str, d: str
) -> tuple[str, str, str]:
    """One unrolled Hilbert iteration at scale ``s`` (a power of two):
    returns (new_x, new_y, new_d) SQL expressions over columns x, y, d.
    Uses only +,-,&,CASE — identical semantics in Spark SQL and DuckDB."""
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    # (3*rx) XOR ry without ^: equals 3*rx + ry - 2*((3*rx & ry) * 2 ... )
    # simpler: enumerate the 4 cases
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
        f" WHEN {rx} = 0 AND {ry} = 1 THEN 1"
        f" WHEN {rx} = 1 AND {ry} = 1 THEN 2"
        f" ELSE 3 END)"
    )
    new_d = f"({d} + CAST({s} AS BIGINT) * {s} * {quad})"
    xr = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - {x} ELSE {x} END)"
    yr = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - {y} ELSE {y} END)"
    new_x = f"(CASE WHEN {ry} = 0 THEN {yr} ELSE {x} END)"
    new_y = f"(CASE WHEN {ry} = 0 THEN {xr} ELSE {y} END)"
    return new_x, new_y, new_d


def with_hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    key_col: str = "_h",
) -> DataFrame:
    """Append the Hilbert index over TWO integer-valued columns (same
    bounds/normalization machinery as the Morton key)."""
    from pyspark.sql import types as T

    if len(cols) != 2:
        raise ValueError("Hilbert clustering is 2-D; use Z-order for 3+")
    if 2 * bits > 62:
        raise ValueError(f"2 x {bits} bits overflows BIGINT")
    is_int = {
        c: isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        )
        for c in cols
    }
    bounds = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("bigint" if is_int[c] else "double").alias(f"_lo_{c}"),
                F.max(c).cast("bigint" if is_int[c] else "double").alias(f"_hi_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    for c, s in zip(cols, ("_hx", "_hy")):
        out = out.withColumn(
            s, scale_to_grid(c, f"_lo_{c}", f"_hi_{c}", bits, is_int[c])
        )
    out = out.withColumn("_hd", F.lit(0).cast("bigint"))
    for k in range(bits - 1, -1, -1):
        nx, ny, nd = hilbert_step_exprs(1 << k, "_hx", "_hy", "_hd")
        out = out.withColumns(
            {"_hx": F.expr(nx), "_hy": F.expr(ny), "_hd": F.expr(nd)}
        )
    return out.withColumn(key_col, F.col("_hd")).drop(
        "_hx", "_hy", "_hd",
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols],
    )


def write_hilbert_clustered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Hilbert index of two
    columns — same range-partition + sort shape as ``write_zordered``."""
    keyed = with_hilbert_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )
