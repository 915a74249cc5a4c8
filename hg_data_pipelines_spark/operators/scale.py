"""Scale operators: skew-salted joins and bucketed co-located joins.

These are the two knobs SURVEY.md §4.2 reserves for 100 TB workloads that
AQE alone doesn't cover:

- ``salted_join``: when one join key dominates (power-law user_ids,
  null-heavy dims), a plain hash join sends the hot key to one task. The
  salt splits each skewed left row across ``n_salts`` partitions and
  replicates the matching right rows across the same salts — same result
  set, ~n_salts× better max-task balance. AQE's skew-join handles *sort-
  merge* skew after the fact; salting fixes it at plan time and also works
  for aggregations.
- ``write_bucketed`` / ``read_bucketed``: pre-shuffle fact tables into N
  buckets on the join key at write time; repeated joins/aggregations on
  that key then run with NO exchange (verified by plan inspection in
  tests). This is the "pay the shuffle once" contract for fact⋈fact
  workloads like lineitem⋈orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy skew in ``left[on]``.

    Left rows get a random-but-deterministic salt from a sibling column
    hash (falling back to monotonically_increasing_id would break
    determinism across retries; xxhash64 of the whole row's key + a
    per-partition counter is unnecessary — any column hash spreads the hot
    key). Right rows are replicated across all salts via a literal
    explode. Result == plain join (verified by the declared test); max
    task size for the hot key drops by ~n_salts.

    Only left-preserving joins are sound under this scheme: every right
    row exists once PER SALT, so a right/full outer join would emit each
    unmatched right row ``n_salts`` times. Those ``how`` values raise —
    salt the other side (swap the inputs) instead.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {
        "inner",
        "left",
        "leftouter",
        "leftsemi",
        "semi",
        "leftanti",
        "anti",
    }:
        raise ValueError(
            f"salted_join: how={how!r} is unsound — unmatched right rows are "
            f"replicated once per salt (right side is exploded across all "
            f"{n_salts} salts). Use inner/left/semi/anti, or swap the inputs "
            "so the skewed, preserved side is on the left."
        )
    salt = (F.xxhash64(*[F.col(c) for c in left.columns]) % n_salts + n_salts) % n_salts
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` bucketed (and sorted) on the join key.

    Spark's bucketing metadata lives in the session catalog
    (saveAsTable); subsequent scans expose the hash-partitioned layout so
    joins/aggs on ``bucket_col`` skip their exchange.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def approx_top_k(
    df: DataFrame,
    col: str,
    k: int = 20,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Heavy hitters: top-k values of ``col`` by count, candidate-then-
    verify — the 100 TB alternative to a full groupBy when the value
    domain is huge and only the head matters.

    Phase 1 (no shuffle): each partition counts locally and keeps its own
    top ``candidates_per_partition`` (default 4k) values. Any global
    top-k value must be a local top-m in at least one partition whenever
    m ≥ k (a global heavy hitter cannot be outside a partition's local
    top-m everywhere if m ≥ k, by averaging); the default margin guards
    adversarial splits.
    Phase 2: exact counts for the candidate union only — the shuffle
    carries |candidates| ≈ partitions × m rows, not the full domain.
    Counts in the output are EXACT; only membership of the tail near the
    k-boundary is approximate.
    """
    m = candidates_per_partition or 4 * k

    def _local_top(it):
        import pandas as pd

        for pdf in it:
            counts = pdf[col].value_counts().head(m)
            yield pd.DataFrame({col: counts.index})

    cand = (
        df.select(col)
        .mapInPandas(_local_top, f"{col} {dict(df.dtypes)[col]}")
        .distinct()
    )
    exact = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    # k-row merge) — no single-task rank window over the candidate set
    return exact.orderBy(F.desc("n"), F.asc(col)).limit(k)


def write_range_clustered(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int = 8,
) -> str:
    """Range-partition + sort the data on ``col`` before a Parquet write,
    so each output file covers a disjoint value range.

    This is the data-skipping layout lever: Parquet stores per-row-group
    min/max statistics, and a range-clustered layout makes a selective
    filter on ``col`` prune whole files/row-groups at scan time instead of
    reading everything (the single-column equivalent of Z-ordering).
    ``repartitionByRange`` samples split points; ``sortWithinPartitions``
    orders rows inside each file so row-group stats are tight.
    """
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 16,
) -> str:
    """Two-dimensional Z-order (Morton) clustering before a Parquet write:
    selective filters on EITHER column prune files/row-groups.

    Thin wrapper over the canonical N-column implementation in
    ``operators/layout.py`` (integer-exact grid scaling + bit
    interleave, min/max bounds broadcast back — no driver action, no
    window). Because the Morton curve preserves locality in both
    dimensions, every output file covers a small rectangle of (x, y)
    space, so Parquet min/max stats stay tight on both columns — unlike
    single-column range clustering (``write_range_clustered``), which
    leaves the second column's per-file range at ~100% of global. This
    is the layout lever for multi-predicate scan pruning at 100 TB; the
    clustering key is layout-only and never changes stored values.
    Columns must be integral (cast timestamps upstream); the key math is
    oracle-checked by the S17_zorder_key_events declared query.
    """
    from .layout import write_zordered

    write_zordered(df, [col_x, col_y], path, n_files=n_files, bits=bits)
    return path


def adaptive_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    hot_k: int = 8,
    hot_min_fraction: float = 0.01,
    how: str = "inner",
    discovery: str = "sample",
    sample_fraction: float = 0.02,
) -> DataFrame:
    """Skew join that salts ONLY the hot keys.

    Blanket salting (``salted_join``) replicates the ENTIRE right side
    ``n_salts``× — fine for a small dim, a disaster for a large one.
    The adaptive form first discovers the left side's heavy hitters,
    keeps those above ``hot_min_fraction`` of rows, and splits the join:
    hot keys get salted left rows against a ``n_salts``×
    replicated-hot-only right slice; everything else joins plain. The
    replication cost drops from |right| × n_salts to |right ∩ hot| ×
    n_salts — at 100 TB that is the difference between a working skew
    mitigation and a new bottleneck. The hot-key set is a bounded driver
    list (≤ hot_k values), the same permissible-collect class as IVF
    centroids. Result ≡ plain join for any salt assignment AND any
    discovered hot set — discovery decides plan shape only, so the cheap
    default is a seeded ``sample_fraction`` scan (one small job: a key
    with ≥ hot_min_fraction of rows is hit hundreds of times by a 2%
    sample at any realistic scale, and both its count and the total are
    estimated from the same sample so the fraction is unbiased).
    ``discovery='exact'`` switches to the candidate-then-verify
    ``approx_top_k`` pass (exact counts) for callers that also *report*
    the hot keys.
    """
    if discovery == "exact":
        total = left.count()
        hot_rows = approx_top_k(left, on, k=hot_k).collect()
        hot = [
            r[on]
            for r in hot_rows
            if r["n"] >= max(1, int(total * hot_min_fraction))
        ]
    else:
        sampled = (
            left.select(on)
            .sample(fraction=sample_fraction, seed=7)
            .groupBy(on)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # total and top keys from the SAME sampled aggregate (scalar rides
        # as a broadcast row — one job, no second scan of `left`)
        tot = sampled.agg(F.sum("_n").alias("_t"))
        rows = (
            sampled.crossJoin(F.broadcast(tot))
            .orderBy(F.desc("_n"), F.asc(on))
            .limit(hot_k)
            .collect()
        )
        hot = [
            r[on]
            for r in rows
            if r["_t"] and r["_n"] >= max(1.0, r["_t"] * hot_min_fraction)
        ]
    if not hot:
        return left.join(right, on, how)

    l_hot = left.filter(F.col(on).isin(hot))
    l_cold = left.filter(~F.col(on).isin(hot) | F.col(on).isNull())
    r_hot = right.filter(F.col(on).isin(hot))
    r_cold = right.filter(~F.col(on).isin(hot) | F.col(on).isNull())

    hot_joined = salted_join(l_hot, r_hot, on, n_salts=n_salts, how=how)
    cold_joined = l_cold.join(r_cold, on, how)
    return hot_joined.unionByName(cold_joined)


def _range_pinned(df: DataFrame, order_by: list, n_parts: int | None = None) -> DataFrame:
    """Range-partition ``df`` on a total order and pin the layout.

    Returns ``df`` with a ``_pid`` column = the range-partition index.
    ``localCheckpoint(eager=False)`` materializes the partitioning at
    first use, so every downstream branch (per-partition offsets AND the
    main pass) sees the SAME pid assignment — without it a recomputation
    could re-sample different range boundaries. Partition count defaults
    to the cluster parallelism; result values are invariant to where the
    boundaries fall, so the sampling inside ``repartitionByRange`` never
    affects output.
    """
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # pin the INPUT first: repartitionByRange's boundary-sampling pass and
    # the real shuffle would otherwise each recompute the upstream plan
    # (e.g. a tokenize projection) from scratch — the input here is always
    # a slim projection, so caching it costs little and halves the work
    pinned_in = df.localCheckpoint(eager=False)
    return (
        pinned_in.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )


def global_running_sum(
    df: DataFrame,
    order_by: list,
    val_col: str,
    out_col: str,
    exclusive: bool = True,
    n_parts: int | None = None,
) -> DataFrame:
    """Running SUM(val_col) over a GLOBAL total order — as a distributed
    prefix-sum, never an unpartitioned window.

    ``Window.orderBy(...)`` with no partition spec funnels every row
    through ONE task — correct at sf0.1, a single-executor bottleneck at
    100 TB. The distributed shape: (1) range-partition on the order so
    partitions hold contiguous key ranges; (2) per-partition subtotals —
    one tiny row per partition; (3) cumulative offsets over that
    partition-count-sized table (bounded window); (4) broadcast the
    offsets back and finish with a PARTITION-LOCAL running sum. Same
    values as the global window for any choice of range boundaries.

    ``order_by`` must be a total order (include tiebreak keys);
    ``exclusive=True`` sums strictly-preceding rows (0 for the first).
    """
    from pyspark.sql import Window

    pinned = _range_pinned(df, order_by, n_parts)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pinned.groupBy("_pid")
        .agg(F.sum(val_col).alias("_psum"))
        # window over ≤ n_parts post-aggregation rows — bounded by design
        .select("_pid", F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_off"))
    )
    upper = -1 if exclusive else 0
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        pinned.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(val_col).over(w_loc), F.lit(0)) + F.col("_off"),
        )
        .drop("_pid", "_off")
    )


def global_running_min(
    df: DataFrame,
    order_by: list,
    val_col: str,
    out_col: str,
    exclusive: bool = True,
    n_parts: int | None = None,
) -> DataFrame:
    """Running MIN(val_col) over a GLOBAL total order — distributed
    prefix-scan, same scheme as ``global_running_sum`` (min is
    associative, so per-partition mins compose the same way subtotals
    do). The exclusive identity is NULL, not 0: the first row globally
    gets NULL ``out_col`` (no strictly-preceding row), and ``F.least``'s
    null-skipping merges the partition offset with the local prefix.

    ``order_by`` must be a total order (include tiebreak keys) unless
    the input has one row per order key — with duplicate keys an
    exclusive ROWS frame would include an arbitrary subset of the
    equal-key run.
    """
    from pyspark.sql import Window

    pinned = _range_pinned(df, order_by, n_parts)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pinned.groupBy("_pid")
        .agg(F.min(val_col).alias("_pmin"))
        # window over ≤ n_parts post-aggregation rows — bounded by design
        .select("_pid", F.min("_pmin").over(w_off).alias("_off"))
    )
    upper = -1 if exclusive else 0
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        pinned.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.least(F.min(val_col).over(w_loc), F.col("_off")))
        .drop("_pid", "_off")
    )


def global_row_number(
    df: DataFrame,
    order_by: list,
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """ROW_NUMBER() over a GLOBAL total order, distributed.

    Same prefix-sum scheme as ``global_running_sum`` with val ≡ 1: the
    per-partition offset is the count of rows in preceding range
    partitions, and the local pass is a partition-local ``row_number``.
    ``order_by`` must be a total order for a deterministic result.
    """
    from pyspark.sql import Window

    pinned = _range_pinned(df, order_by, n_parts)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pinned.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pn"))
        .select("_pid", F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_off"))
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        pinned.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.row_number().over(w_loc) + F.col("_off"))
        .drop("_pid", "_off")
    )


def stratified_row_number(
    df: DataFrame,
    strata: list[str],
    order_by: list,
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """ROW_NUMBER() PARTITION BY strata ORDER BY order_by — WITHOUT one
    task per stratum.

    A plain per-stratum window puts each stratum's entire sort in a
    single task: fine for high-cardinality keys, a bottleneck when
    strata are few and fat (languages, sources — one language can be
    60% of a web corpus). Here the data range-partitions on
    (strata, order) so a fat stratum SPANS many partitions; per-
    (partition, stratum) counts give each partition its per-stratum
    offset (bounded: n_parts × n_strata rows), and a partition-local
    window finishes. Bit-identical to the single-window form.

    (For a CONSTANT rank limit k, prefer the plain window: Spark's
    WindowGroupLimit pushes the top-k below the exchange and the skew
    disappears. This primitive is for unbounded ranks or data-dependent
    limits — exact fractions, ntile-style cuts — which cannot push.)
    """
    from pyspark.sql import Window

    strata_cols = [F.col(c) for c in strata]
    pinned = _range_pinned(df, [*strata_cols, *order_by], n_parts)
    w_off = (
        Window.partitionBy(*strata)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        pinned.groupBy("_pid", *strata)
        .agg(F.count(F.lit(1)).alias("_pn"))
        # window over ≤ n_parts × n_strata post-aggregation rows
        .select(
            "_pid",
            *strata,
            F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    w_loc = Window.partitionBy("_pid", *strata).orderBy(*order_by)
    return (
        pinned.join(F.broadcast(offsets), ["_pid", *strata])
        .withColumn(out_col, F.row_number().over(w_loc) + F.col("_off"))
        .drop("_pid", "_off")
    )


def global_ntile(
    df: DataFrame,
    order_by: list,
    k: int,
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """NTILE(k) over a GLOBAL total order, distributed.

    ntile is a pure function of (global row number, total row count):
    with N rows, the first N % k tiles hold ceil(N/k) rows and the rest
    floor(N/k). Both inputs come from the same prefix-sum machinery as
    ``global_row_number`` (the total rides along on the bounded offsets
    table), so bucket assignment is bit-identical to the single-window
    form — including tie handling, which follows ``order_by`` exactly —
    while no task ever sees more than one range partition.
    """
    from pyspark.sql import Window

    pinned = _range_pinned(df, order_by, n_parts)
    counts = pinned.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_pn").over(w_all).alias("_total"),
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order_by)
    rn = F.row_number().over(w_loc) + F.col("_off")
    q = F.floor(F.col("_total") / k).cast("bigint")  # base tile size
    rem = (F.col("_total") % k).cast("bigint")  # first `rem` tiles get q+1
    big = q + F.lit(1)
    cut = big * rem  # rows 1..cut fall in the (q+1)-sized tiles
    # ceil(a/b) as floor((a-1)/b)+1 — exact while a < 2^53 (double mantissa)
    in_big = F.floor((rn - 1) / big) + 1
    in_small = rem + F.floor((rn - cut - 1) / q) + 1
    return (
        pinned.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(rn <= cut, in_big).otherwise(in_small).cast("int"),
        )
        .drop("_pid", "_off", "_total")
    )


def merge_algebraic_aggregates(
    prev: DataFrame,
    delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental (materialized-view) refresh for algebraic aggregates.

    ``prev`` and ``delta`` are partial aggregates with identical schemas:
    the group keys plus mergeable measures — counts and sums, which this
    re-aggregation folds with SUM. The refresh cost is
    O(|delta| + |changed groups|), never a rescan of history — at 100 TB
    this is the difference between a nightly delta fold and a full
    recompute. Non-algebraic measures (medians, distincts) need sketch
    representations (see A9's mergeable HLL rollup) — they are NOT valid
    inputs here.

    Exactness contract: keep partial sums in DECIMAL until after the
    merge (cast-to-double per phase would make the two-phase result
    diverge from a direct aggregate by float association noise).
    """
    measures = [c for c in prev.columns if c not in keys]
    return (
        prev.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
    )


def quantile_bucket_assign(
    df: DataFrame,
    val_col: str,
    probs: list[float],
    out_col: str = "bucket",
) -> DataFrame:
    """Value-based quantile binning: exact percentile cutpoints + an
    arithmetic assignment — the SHUFFLE-FREE alternative to
    ``global_ntile`` when equal-count-with-exact-tie semantics aren't
    required. The cutpoints come from the scan-bounded selection
    (``percentile_cont_exact`` — bit-identical to the percentile_cont
    aggregate whose distinct-value buffer is row-bounded on a continuous
    column, the r12 §5 defect class) and are embedded as LITERALS, so
    ``bucket = 1 + Σ (v > c_i)`` (rows equal to a cutpoint land in the
    lower bucket) assigns inside the scan projection: no range
    partitioning, no sort, no window, not even a broadcast — at 100 TB
    the whole operator is two bounded aggregation passes plus a map.
    """
    cuts = percentile_cont_exact(df, val_col, list(probs))
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + F.when(
            F.col(val_col) > F.lit(c).cast("double"), 1
        ).otherwise(0)
    return df.withColumn(out_col, bucket.cast("int"))


def exact_quantiles_twopass(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT discrete quantiles (the value at rank ``ceil(q*n)``) per
    group WITHOUT a global sort — the scan-bounded scale path next to
    ``F.percentile`` (one sort-based aggregate) and A27's mergeable
    summaries (bounded error).

    Histogram refinement, the classic two-pass selection algorithm:

    1. one aggregate pass → per-group extents (lo/hi/n);
    2. one aggregate pass → per-group fixed-width bucket counts; the
       (|groups| × n_buckets)-bounded histogram is collected and, per
       (group, q), the driver locates the TARGET bucket and the rank
       offset within it (bucket assignment is monotone in the value, so
       exact rank arithmetic survives float boundary jitter);
    3. one filtered pass keeps only rows in target buckets (~n/n_buckets
       per quantile) and a per-(group, q) window picks the offset-th
       value.

    At 100 TB this is two column scans + a window over a bucket-sized
    slice, versus shuffling the full relation into a per-group sort.
    Contract: ``group_col`` must be low-cardinality (the collected
    histogram is groups × populated buckets); high-cardinality keys
    belong to A27. NaN values are excluded (same pinned boundary as
    ``percentile_cont_exact``).

    r13: the extent pass is gone — the bucketing is the same
    value-independent monotone log2 ladder the percentile selection
    uses, so ONE aggregation job delivers per-(group, bucket)
    (count, min, max) and group sizes fall out as count sums; targets
    embed as literal predicates + an exploded literal struct array (no
    broadcast exchange, no createDataFrame). One driver job per call
    (was two collects + two broadcast-built joins in the returned plan).
    """
    import math

    from pyspark.sql import Window

    v = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull() & ~F.isnan(F.col("x")))
    bcol = _log_bucket(F.col("x"))
    hist: dict = {}
    for r in (
        v.groupBy("g", bcol.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        hist.setdefault(r["g"], []).append((r["b"], r["c"]))
    targets: dict = {}  # (g, b) -> [(q, off)]
    for g, buckets in hist.items():
        buckets = sorted(buckets)
        n = sum(c for _b, c in buckets)
        for q in quantiles:
            # ceil of the IEEE double q*n — both engines multiply the
            # same doubles, so the rank agrees with the oracle's CEIL
            k = max(1, min(int(math.ceil(q * n)), n))
            cum = 0
            for b, c in buckets:
                if cum + c >= k:
                    targets.setdefault((g, b), []).append(
                        (float(q), k - cum)
                    )
                    break
                cum += c
    # materialize the bucket id ONCE per row: the literal dispatch below
    # is a when-chain with one branch per (group, bucket) target, and
    # codegen does not share the log2 subtree across branches — without
    # this column each branch would recompute it (measured ~+0.8 s at
    # 600k rows × 15 branches)
    arr = F.array().cast("array<struct<q:double,off:bigint>>")
    for (g, b), qos in targets.items():
        cond = F.col("g").eqNullSafe(F.lit(g)) & (F.col("_b") == F.lit(b))
        arr = F.when(
            cond,
            F.array(
                *[
                    F.struct(
                        F.lit(q).cast("double").alias("q"),
                        F.lit(off).cast("bigint").alias("off"),
                    )
                    for q, off in qos
                ]
            ),
        ).otherwise(arr)
    w = Window.partitionBy("g", "t.q").orderBy("x")
    picked = (
        v.withColumn("_b", bcol)
        .select("g", "x", F.explode(arr).alias("t"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("t.off"))
        .select("g", F.col("t.q").alias("q"), "x")
    )
    def _qname(q: float) -> str:
        # deterministic: p{percent:02d} for 2-dp quantiles (q=0.5 -> p50,
        # q=1.0 -> p100); otherwise fixed-point digits from the Decimal
        # of q*100 (q=0.125 -> p12_5) — Decimal formatting never emits
        # scientific notation or float-repr tail digits (advisor fix:
        # repr(scaled) gave p10_100000000000001 for q=0.101 and 1e-05
        # style output for tiny q)
        from decimal import Decimal

        scaled = q * 100.0
        if abs(scaled - round(scaled)) < 1e-9:
            return f"p{int(round(scaled)):02d}"
        d = (Decimal(repr(q)) * 100).normalize()
        body = format(d, "f")  # plain fixed-point, no exponent
        return "p" + body.replace("-", "m").replace(".", "_")

    names = [_qname(q) for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(f"quantile column names collide: {names}")
    agg = picked.groupBy("g").agg(
        *[
            F.max(F.when(F.col("q") == q, F.col("x"))).alias(name)
            for q, name in zip(quantiles, names)
        ]
    )
    return agg.withColumnRenamed("g", group_col)


# --- exact percentile_cont selection (scan-bounded, ≤ 2 Spark jobs) -------
#
# Shared machinery for percentile_cont_exact / percentile_cont_exact_grouped:
# a VALUE-INDEPENDENT monotone bucketing (sign-split log2 ladder, ~1024
# buckets per octave) lets ONE aggregation pass deliver the per-bucket
# (count, min, max) histogram — no separate extent pass, no broadcast-built
# extent join: the r12 shape paid ~6 fixed-latency driver jobs per call
# (extent collect + two broadcast exchanges + histogram + target broadcast +
# pick); this one pays exactly 2 (histogram, pick), and the pick pass is
# skipped entirely when every needed order statistic resolves from the
# histogram itself (rank at a bucket edge, or a single-valued bucket —
# common on tie-heavy columns).

_LOG_BUCKETS_PER_OCTAVE = 1024
# clears ±max|floor(1024·log2(|x|))| (~1.1e6) for every finite double, so
# negative / zero / positive ids can never interleave
_LOG_BUCKET_OFFSET = 2_200_000


def _log_bucket(col):
    """Monotone double → bigint bucket id, no extent needed.

    Weakly monotone by construction: log2 is semi-monotonic (java.lang.Math
    contract), ×1024 is an exact power-of-two scaling, floor is monotone,
    and the sign split keeps negatives < 0-bucket < positives. Monotonicity
    is ALL refinement needs — each bucket is a contiguous value range, so
    exact rank arithmetic over bucket counts stays exact. Resolution is
    ~0.07 % of the value per bucket (2^(1/1024) spacing), the same order as
    the old 1024-fixed-width grid on a few-octave column, and *finer* near
    zero (where MAD deviations cluster). NaN is filtered out by callers
    (divergence from F.percentile, which sorts NaN last — documented);
    non-finite values are outside the contract, as before.
    """
    scaled = lambda c: F.floor(F.log2(c) * _LOG_BUCKETS_PER_OCTAVE)  # noqa: E731
    return (
        F.when(col == 0, F.lit(0))
        .when(col > 0, F.lit(_LOG_BUCKET_OFFSET) + scaled(col))
        .otherwise(F.lit(-_LOG_BUCKET_OFFSET) - scaled(-col))
        .cast("long")
    )


def _interpolate_cont(positions: list[float], vals: dict) -> list[float]:
    """Spark ``PercentileBase.getPercentile`` interpolation, mirrored
    EXACTLY (verified against the 4.1.2 bytecode): early-return when
    floor == ceil or the two keys are equal; otherwise
    (higher − position) · lowerVal + (position − lower) · higherVal in
    that IEEE operation order — Python floats are the same binary64 ops,
    so results are bit-identical to the aggregate's (pinned by tests)."""
    import math

    out = []
    for pos in positions:
        lo_i, hi_i = int(math.floor(pos)), int(math.ceil(pos))
        lo_v, hi_v = vals[lo_i + 1], vals[hi_i + 1]
        if hi_i == lo_i or lo_v == hi_v:
            out.append(lo_v)
        else:
            out.append((float(hi_i) - pos) * lo_v + (pos - float(lo_i)) * hi_v)
    return out


def _ranks_for(positions: list[float]) -> list[int]:
    import math

    need: set[int] = set()
    for pos in positions:
        need.add(int(math.floor(pos)) + 1)
        need.add(int(math.ceil(pos)) + 1)
    return sorted(need)


def percentile_cont_exact(
    df: DataFrame,
    value_col: str,
    percentages: list[float],
) -> list:
    """Exact ``percentile_cont`` values (bit-identical to Spark's
    ``F.percentile`` / DuckDB's WITHIN GROUP form) WITHOUT the sort-based
    aggregate — the global twin of ``exact_quantiles_twopass``.

    Why: ``F.percentile`` buffers one (value, count) entry per DISTINCT
    value and merges + sorts that buffer on a single reducer. On a
    near-continuous column the buffer is row-bounded, not domain-bounded
    (measured r12: 583k distinct prices in 600k lineitem rows → the
    aggregate alone ran ~4 s single-threaded, and at 100 TB it is an
    executor OOM). Histogram refinement finds the two order statistics
    each percentile interpolates between in ≤ 2 scan-bounded jobs (see
    ``_select_order_stats``), with driver state bounded by the populated
    bucket count.

    Returns plain Python floats (the caller embeds them as literals —
    the bounded-model-collect pattern of ivf_train/exact_quantiles).
    An empty / all-null / all-NaN column yields ``None`` per entry
    (matching the aggregate's NULL, advisor r12); NaN values are
    excluded (``F.percentile`` sorts them last — divergence documented
    and pinned in tests/test_scale.py).
    """
    out = percentile_cont_exact_grouped(
        df.select(F.lit(1).alias("_g"), F.col(value_col)),
        "_g",
        value_col,
        percentages,
    )
    return out.get(1, [None] * len(percentages))


def percentile_cont_exact_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentages: list[float],
) -> dict:
    """Per-group ``percentile_cont`` values via the same histogram
    refinement as ``percentile_cont_exact`` (same bit-exact Spark
    interpolation), for LOW-CARDINALITY group keys (driver state is
    |groups| × populated buckets, the exact_quantiles_twopass contract).
    Returns {group: [value per percentage]}; groups whose values are all
    null/NaN are ABSENT from the result (callers fall through to a NULL
    literal — the F.percentile aggregate would emit a NULL-valued row).
    """
    from pyspark.sql import Window

    v = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("x")
    ).filter(F.col("x").isNotNull() & ~F.isnan(F.col("x")))
    # JOB 1 — the only unconditional one: per-(group, log-bucket)
    # (count, min, max), one map-combinable aggregation, collected
    # (bounded: populated buckets only — ≤ a few thousand per group for
    # any realistic dynamic range). Group sizes n fall out as the sum of
    # bucket counts, so there is NO separate extent pass; ranks landing
    # on a bucket edge (offset 1 / offset count) or in a single-valued
    # bucket resolve straight from the bucket min/max.
    positions_by_g: dict = {}
    need: dict = {}
    hist_rows = (
        v.groupBy("g", _log_bucket(F.col("x")).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("x").alias("bmin"),
            F.max("x").alias("bmax"),
        )
        .collect()
    )
    hist: dict = {}
    for r in hist_rows:
        hist.setdefault(r["g"], []).append(
            (r["b"], r["c"], r["bmin"], r["bmax"])
        )
    for g, buckets in hist.items():
        n = sum(c for _b, c, _mn, _mx in buckets)
        poss = [float(n - 1) * p for p in percentages]
        positions_by_g[g] = poss
        need[g] = _ranks_for(poss)
    vals: dict = {}
    unresolved: list = []
    for g, ranks in need.items():
        buckets = sorted(hist[g])
        vals[g] = {}
        cum, i = 0, 0
        for k in ranks:
            while i < len(buckets):
                b, c, bmin, bmax = buckets[i]
                if cum + c >= k:
                    off = k - cum
                    if bmin == bmax or off == 1:
                        vals[g][k] = float(bmin)
                    elif off == c:
                        vals[g][k] = float(bmax)
                    else:
                        unresolved.append((g, b, k, off))
                    break
                cum += c
                i += 1
    if unresolved:
        # JOB 2 — only when a rank sits strictly inside a multi-valued
        # bucket: target-bucket rows are selected by LITERAL (g, b)
        # predicates and matched to their (rank, offset) via an exploded
        # literal struct array — no broadcast exchange, no
        # createDataFrame — then a per-(g, rank) window picks the
        # offset-th value of the ~n/buckets-sized slice.
        by_gb: dict = {}
        for g, b, k, off in unresolved:
            by_gb.setdefault((g, b), []).append((k, off))
        # bucket id materialized once per row — the when-chain has one
        # branch per (group, bucket) target and codegen does not share
        # the log2 subtree across branches (see exact_quantiles_twopass)
        arr = F.array().cast("array<struct<k:bigint,off:bigint>>")
        for (g, b), kos in by_gb.items():
            cond = F.col("g").eqNullSafe(F.lit(g)) & (
                F.col("_b") == F.lit(b)
            )
            arr = F.when(
                cond,
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("bigint").alias("k"),
                            F.lit(off).cast("bigint").alias("off"),
                        )
                        for k, off in kos
                    ]
                ),
            ).otherwise(arr)
        w = Window.partitionBy("g", "t.k").orderBy("x")
        picked = (
            v.withColumn("_b", _log_bucket(F.col("x")))
            .select("g", "x", F.explode(arr).alias("t"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == F.col("t.off"))
            .select("g", F.col("t.k").alias("k"), "x")
        )
        for r in picked.collect():
            vals[r["g"]][int(r["k"])] = float(r["x"])
    return {
        g: _interpolate_cont(poss, vals[g])
        for g, poss in positions_by_g.items()
    }
