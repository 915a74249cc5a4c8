"""Banded range join (SURVEY.md EXT-J8): a range/theta join with NO equi
key, made shuffle-joinable by time-grain banding.

A raw ``l.ts < r.ts <= l.ts + W`` join with no equi component forces a
nested-loop/cartesian plan. Banding restores an equi key: each left row
explodes into the grain buckets its window covers (``W/grain + 1`` rows),
each right row keys by its own bucket, the bucket equi-join bounds
candidates to |window density|, and the exact range predicate filters
residually. This is the same candidate-bounding substitution LSH makes
for similarity joins, applied to time — at 100 TB the bucket join
shuffles on a well-distributed integer key instead of nothing at all.

Grain choice trades replication (left rows × buckets covered) against
candidate precision (right rows per bucket); grain ≈ W is the usual
sweet spot (≤2 buckets per left row).

All bucket arithmetic is exact integer epoch-microseconds, so results
are engine- and layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    grain_us: int | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``l_ts + lower_us < r_ts <= l_ts + upper_us``.

    Returns all left columns plus all right columns (names must be
    disjoint). Inner-join semantics; aggregate and re-join to the left
    table for left-join counts.
    """
    if grain_us is None:
        grain_us = max(upper_us - lower_us, 1)
    lts = f"unix_micros(cast({left_ts} as timestamp))"
    rts = f"unix_micros(cast({right_ts} as timestamp))"
    banded_left = left.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(({lts} + {lower_us}) DIV {grain_us},"
                f" ({lts} + {upper_us}) DIV {grain_us})"
            )
        ),
    )
    banded_right = right.withColumn("_bucket", F.expr(f"{rts} DIV {grain_us}"))
    return (
        banded_left.join(banded_right, "_bucket")
        .filter(
            F.expr(f"{rts} > {lts} + {lower_us}")
            & F.expr(f"{rts} <= {lts} + {upper_us}")
        )
        .drop("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    grain_days: int,
) -> DataFrame:
    """Pairs of OVERLAPPING intervals across two relations (l_start <=
    r_end AND r_start <= l_end) — the two-sided generalization of the
    banded point-in-range join (J8): both sides carry variable-length
    intervals and there is no equality key at all.

    Scale shape: each interval explodes into the day-grain bands it
    covers (≤ len/grain + 1 rows — pick ``grain_days`` ≥ the typical
    interval length so the fan-out is 1-2), candidates equi-join on the
    band, the exact overlap predicate verifies, and each pair is kept
    only in the FIRST band the two intervals share
    (``_band == greatest(band(l_start), band(r_start))`` — overlapping
    intervals always co-occur in that band), so multi-band pairs emit
    exactly once WITHOUT a full-row ``distinct()``. That keeps output
    multiplicity identical to the naive theta join (legitimately
    duplicated input rows stay duplicated) and saves a whole-row
    shuffle; it also drops the old requirement that every carried
    column type be comparable. A naive theta join is |L|·|R|
    comparisons through one node; this is |bands| hash-join work, the
    same candidate-bounding trick LSH uses for X2.

    Column names across ``left`` and ``right`` must be disjoint (the
    band join carries both sides' columns through).
    """
    day = "unix_date(cast({c} as date))"

    def bands(df, s, e, start_band):
        start = F.expr(f"{day.format(c=s)} DIV {grain_days}")
        return df.withColumn(start_band, start).withColumn(
            "_band",
            F.explode(
                F.expr(
                    f"sequence({day.format(c=s)} DIV {grain_days},"
                    f" {day.format(c=e)} DIV {grain_days})"
                )
            ),
        )

    cand = bands(left, l_start, l_end, "_lsb").join(
        bands(right, r_start, r_end, "_rsb"), "_band"
    )
    return (
        cand.filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # first-shared-band dedup: emit the pair exactly once
            & (F.col("_band") == F.greatest("_lsb", "_rsb"))
        )
        .drop("_band", "_lsb", "_rsb")
    )


def grid_neighbor_join(
    left: DataFrame,
    right: DataFrame,
    lx: str,
    ly: str,
    rx: str,
    ry: str,
    radius: float,
) -> DataFrame:
    """2-D Euclidean neighbor join via grid blocking: all (l, r) pairs
    with ``dist((lx,ly),(rx,ry)) <= radius``, plus a ``dist`` column.

    The 2-D analogue of ``banded_range_join``: each left point explodes
    into its own grid cell plus the 8 surrounding cells, each right
    point keys by its own cell, and the cell equi-join bounds candidates
    to local density before the exact distance predicate filters
    residually. Cell size is ``radius`` (with a 1e-6 relative margin so
    FP division rounding can never push a qualifying pair across two
    cell boundaries), which guarantees every pair within ``radius``
    shares or neighbors a cell — the blocking is COMPLETE, so the
    result is identical to the quadratic theta join. At 100 TB this
    shuffles on a well-distributed (cx, cy) integer key with ~9×
    left-side replication instead of building a cartesian plan; local
    density, not corpus size, bounds per-key work.

    Column names across ``left`` and ``right`` must be disjoint. The
    ``dist`` column is the unrounded double ``sqrt((lx-rx)² + (ly-ry)²)``
    (callers round for display); the residual filter uses the same
    expression, so output membership is engine-exact.
    """
    if not radius > 0:
        raise ValueError(
            f"radius must be positive, got {radius!r} — for coincident-"
            "point matching use an exact (x, y) equi-join instead"
        )
    cell = float(radius) * 1.000001
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    banded_left = (
        left.withColumn("_o", F.explode(offsets))
        .withColumn("_cx", (F.floor(F.col(lx) / cell) + F.col("_o.dx")).cast("long"))
        .withColumn("_cy", (F.floor(F.col(ly) / cell) + F.col("_o.dy")).cast("long"))
        .drop("_o")
    )
    banded_right = right.withColumn(
        "_cx", F.floor(F.col(rx) / cell).cast("long")
    ).withColumn("_cy", F.floor(F.col(ry) / cell).cast("long"))
    d2 = (F.col(lx) - F.col(rx)) * (F.col(lx) - F.col(rx)) + (
        F.col(ly) - F.col(ry)
    ) * (F.col(ly) - F.col(ry))
    return (
        banded_left.join(banded_right, ["_cx", "_cy"])
        .withColumn("dist", F.sqrt(d2))
        .filter(F.col("dist") <= F.lit(float(radius)))
        .drop("_cx", "_cy")
    )


def grid_containment_join(
    points: DataFrame,
    polygons: DataFrame,
    px: str,
    py: str,
    cell: float,
) -> DataFrame:
    """Point-in-CONVEX-polygon containment join with grid blocking — the
    spatial CONTAINMENT sibling of ``grid_neighbor_join``'s radius join.

    ``polygons``: (poly_id, xs array<double>, ys array<double>) with
    vertices in counter-clockwise order; containment (boundary
    inclusive) is the classic all-edges cross-product sign test — for a
    convex CCW ring, P is inside iff every edge's cross product
    (v2-v1) × (P-v1) is ≥ 0. Pure double arithmetic on literal-identical
    vertices, so any engine agrees exactly.

    Blocking: each polygon replicates to every grid cell its bbox
    overlaps; each point hashes to its one cell; the equi-join on
    (cx, cy) bounds candidate pairs by local density × polygon bbox
    area. A point lives in exactly one cell, so no pair dedup is needed.
    At 100 TB both sides shuffle once on a dense integer key — the same
    contract as the neighbor join; the exact test runs post-join on the
    bounded candidates.
    """
    cells = polygons.select(
        "poly_id", "xs", "ys",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(array_min(xs) / {cell}) AS INT),"
                f" CAST(floor(array_max(xs) / {cell}) AS INT))"
            )
        ).alias("cx"),
    ).select(
        "poly_id", "xs", "ys", "cx",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(array_min(ys) / {cell}) AS INT),"
                f" CAST(floor(array_max(ys) / {cell}) AS INT))"
            )
        ).alias("cy"),
    )
    pts = points.withColumn(
        "cx", F.floor(F.col(px) / cell).cast("int")
    ).withColumn("cy", F.floor(F.col(py) / cell).cast("int"))
    cand = pts.join(cells, ["cx", "cy"])
    # all-edges sign test, vertices paired with their cyclic successor
    inside = F.expr(
        f"""forall(
            zip_with(
                arrays_zip(xs, ys),
                concat(slice(arrays_zip(xs, ys), 2, size(xs) - 1),
                       slice(arrays_zip(xs, ys), 1, 1)),
                (v1, v2) -> (v2.xs - v1.xs) * ({py} - v1.ys)
                          - (v2.ys - v1.ys) * ({px} - v1.xs) >= 0),
            ok -> ok)"""
    )
    return cand.filter(inside).drop("cx", "cy", "xs", "ys")
