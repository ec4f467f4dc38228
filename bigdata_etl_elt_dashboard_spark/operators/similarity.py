"""Similarity search over embedding columns (BASELINE.json north star).

The `embeddings` table carries `embedding array<float>`. Two paths:

- **Brute-force top-k** (baseline, exact): broadcast the (small) query set,
  one narrow pass over the corpus computing cosine via higher-order array
  functions (zip_with + aggregate — JVM-side, no Python), then per-query
  top-k with a window. Cost: O(corpus × queries × dim) FLOPs, zero shuffle
  on the corpus side until the final tiny top-k.
- **LSH-bucketed ANN** (scale path): random-hyperplane signatures → only
  same-bucket pairs are scored. Hyperplanes are a deterministic seeded
  matrix broadcast as literals; at 100 TB the candidate join is keyed on
  the signature, exactly like MinHash banding.

Everything stays in array<double> once cast — float math differs between
engines and between SIMD paths, so we standardize on double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential array-order summation —
    deterministic and oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    ``queries`` is broadcast; the corpus is scanned once (narrow). The
    window's partition count equals the number of queries — small — so the
    final rank shuffle is negligible. Self-matches are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def threshold_cosine_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) pairs with cosine ≥ min_sim — the
    embedding-cosine near-dup primitive (no rank cutoff → no tie hazard)."""
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec"))
    return (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= F.lit(min_sim))
    )


def near_dup_pairs(
    corpus: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs embedding-cosine near-dup: every (a, b) with a < b
    and cosine ≥ min_sim, over the WHOLE corpus (not a query subset).

    Shape: self nested-loop join with the smaller projection broadcast —
    exact but O(n²) FLOPs, so it is the per-block/verification kernel. At
    100 TB the outer loop is replaced by LSH blocking (ann candidates from
    ``ann_lsh_topk``'s bucket join) and THIS function scores only the
    candidate pairs; the driver-registered oracle uses the exact form at
    test scale where n² is trivial."""
    a = corpus.select(F.col(id_col).alias("doc_a"), _as_double(F.col(vec_col)).alias("_va"))
    b = corpus.select(F.col(id_col).alias("doc_b"), _as_double(F.col(vec_col)).alias("_vb"))
    return (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= F.lit(min_sim))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-flat: a coarse quantizer of ``n_cells``
    centroids partitions the corpus into inverted lists; each query probes
    its ``nprobe`` nearest cells and scores only those lists.

    Centroids are the ``n_cells`` lowest-id corpus vectors (deterministic,
    no trained k-means — the container has no MLlib fit here and the cell
    assignment math is what matters). They are collected once driver-side
    (tiny, like the reference's driver-computed stats) and injected as plan
    literals, so cell assignment is a narrow JVM-side pass. The candidate
    join is an equi-join on cell id — the inverted-list shape that survives
    scale; expected FLOPs drop by ~n_cells/nprobe vs brute force."""
    cent_rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in cent_rows]

    def probed_cells(vec: Column, n_best: int) -> Column:
        # struct array sorts ascending by (sim, -cell): reversing yields
        # descending sim with smaller cell winning ties — deterministic.
        sims = F.array(
            *[
                F.struct(
                    F.round(cosine(vec, F.array(*[F.lit(v) for v in c])), 9).alias("sim"),
                    F.lit(-i).alias("negcell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        top = F.slice(F.reverse(F.array_sort(sims)), 1, n_best)
        return F.transform(top, lambda s: -s.negcell)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("cell", probed_cells(F.col("c_vec"), 1)[0])
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).select("query_id", "q_vec", F.explode(probed_cells(F.col("q_vec"), nprobe)).alias("cell"))

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no numpy import
    needed at executor side — these become plan literals)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to [-1, 1)
            row.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit b = sign(vec · plane_b) packed into
    a long. Planes are array literals — the dot products are higher-order
    expressions over broadcast constants."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        sig = sig + F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 16,
    planes_per_table: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH.

    Each of the ``n_tables`` hash tables buckets vectors by a
    ``planes_per_table``-bit sign signature; candidates are vectors sharing
    a bucket in ANY table (union via the exploded (table_id, sig) join).
    For neighbors at angle θ, per-table match probability is (1−θ/π)^b —
    multiple coarse tables trade a few extra signature bits per vector for
    recall, while keeping the candidate join an equi-join on
    (table_id, sig): the plan shape that survives a 100×-bigger corpus
    (bucket join, never a cross product)."""
    all_planes = _hyperplanes(dim, n_tables * planes_per_table)
    tables = [
        all_planes[t * planes_per_table : (t + 1) * planes_per_table] for t in range(n_tables)
    ]

    def with_sigs(df, id_alias):
        vec = _as_double(F.col(vec_col))
        sig_structs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    lsh_signature(F.col("_v"), tables[t]).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return (
            df.select(F.col(id_col).alias(id_alias), vec.alias("_v"))
            .select(id_alias, "_v", F.explode(sig_structs).alias("b"))
            .select(id_alias, "_v", F.col("b.table_id").alias("table_id"), F.col("b.sig").alias("sig"))
        )

    q = with_sigs(queries, "query_id").withColumnRenamed("_v", "q_vec")
    c = with_sigs(corpus, "neighbor_id").withColumnRenamed("_v", "c_vec")
    scored = (
        c.join(F.broadcast(q), ["table_id", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])  # union across tables
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
