"""Similarity search over embedding columns (SURVEY.md X3).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline and
  small-query-set path (queries broadcast against the corpus; one pass, no
  shuffle of the corpus).
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path. Hash
  planes are derived from xxhash64 (deterministic, seedable) rather than a
  driver-side RNG so the bucketing is reproducible on any cluster layout.
- cosine is computed over double-cast arrays with a left-to-right fold so
  results are bit-stable and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def _cosine(a: str, b: str) -> F.Column:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return F.expr(f"({dot}) / sqrt(({na}) * ({nb}))")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ranking uses the *rounded* cosine plus the neighbor id as tiebreak, so
    ordering is robust to last-ulp float noise across engines/partitionings.
    Queries are broadcast: the corpus is scanned once, no shuffle until the
    tiny top-k window.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine("qv", "cv"), round_dp).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _rhp_signature(vec_col: str, dim: int, n_planes: int, seed: int) -> F.Column:
    """Random-hyperplane sign signature as an int bucket id.

    Plane p's component d is a deterministic pseudo-random ±1 from
    xxhash64(seed, p, d) — no driver RNG, no broadcast of plane matrices;
    executors recompute the tiny expression locally.
    """
    plane_dot = (
        f"aggregate(zip_with({vec_col}, sequence(0, {dim - 1}),"
        f" (x, d) -> cast(x as double) *"
        f" (CASE WHEN (xxhash64({seed}, p, d) & 1) = 1 THEN 1.0 ELSE -1.0 END)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return F.expr(
        f"aggregate(transform(sequence(0, {n_planes - 1}),"
        f" p -> CASE WHEN ({plane_dot}) >= 0 THEN shiftleft(1L, p) ELSE 0L END),"
        f" 0L, (acc, v) -> acc | v)"
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    round_dp: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share an RHP bucket in any of
    ``n_tables`` hash tables; exact cosine ranks the candidates.

    At 100 TB the bucket join replaces the corpus scan per query: cost is
    |bucket collisions|, not |queries| × |corpus|.
    """
    def sig_table(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}v")
        )
        tables = F.array(
            *[
                _rhp_signature(f"{prefix}v", dim, n_planes, seed)
                for seed in range(n_tables)
            ]
        )
        return out.select(
            f"{prefix}_id", f"{prefix}v", F.posexplode(tables).alias("table", "bucket")
        )

    qs = sig_table(queries, "query")
    cs = sig_table(corpus, "neighbor")
    candidates = (
        qs.join(cs, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine("queryv", "neighborv"), round_dp).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    round_dp: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``n_lists`` cells, probe each query's ``n_probe`` nearest cells,
    exact cosine only within probed cells.

    Centroids are the lowest-id corpus vectors — a deterministic seed set
    (collected: bounded by n_lists, the one permissible driver collect).
    A production variant runs Lloyd iterations over the assignment join;
    the physical plan shape (broadcast centroids → cell-key equi-join) is
    identical, which is what matters at 100 TB: the query side joins
    |corpus|/n_lists × n_probe rows instead of scanning the corpus.
    """
    spark = corpus.sparkSession
    cents = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cents],
            "cid long, cvec array<double>",
        )
    )

    def nearest_cells(df: DataFrame, prefix: str, n: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}v")
        ).crossJoin(cent_df).select(
            f"{prefix}_id",
            f"{prefix}v",
            "cid",
            F.round(_cosine(f"{prefix}v", "cvec"), 9).alias("_sim"),
        )
        w = Window.partitionBy(f"{prefix}_id").orderBy(F.desc("_sim"), "cid")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn", "_sim")
        )

    corpus_cells = nearest_cells(corpus, "neighbor", 1)
    query_cells = nearest_cells(queries, "query", n_probe)

    candidates = (
        query_cells.join(corpus_cells, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine("queryv", "neighborv"), round_dp).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
