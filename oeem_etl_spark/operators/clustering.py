"""Fixed-point k-means over embedding columns + SemDeDup-style pruning.

Capability match: the reference's corpus-curation tier (SURVEY.md §2.L —
embedding-space operations); the clustering-then-prune shape follows the
published SemDeDup recipe (Abbas et al. 2023): cluster embeddings with
k-means, then search for near-duplicate pairs only *within* a cluster,
turning the O(N²) all-pairs scan into O(Σ n_c²) ≈ O(N²/k).

Determinism / oracle strategy — **fixed-point arithmetic**: embeddings and
centroids are quantized to integers (``round(x · 10³)`` as int64), so every
squared-L2 distance is exact integer math. Assignment therefore does not
depend on floating-point summation order and the whole Lloyd iteration is
reproducible bit-for-bit in ANSI SQL (the DuckDB oracle unrolls the same
iterations) and on any cluster/partitioning. Squared distances stay below
dim · (2·maxq)² — int64-safe for any realistic embedding scale (unit-norm
vectors at scale 10³ and dim 4096 peak at ~1.6e10).

Scale shape (100 TB):

- **assignment is a pure map** — the k centroids are folded into the plan
  as literals (k·dim int64s), so scoring N rows against k centroids is
  whole-stage-codegen arithmetic with NO join and NO shuffle;
- **each update is one map-side-combinable aggregation** — posexplode to
  (cluster, pos, value) then SUM/COUNT grouped on (cluster, pos): k·dim
  cells per partition combine before the (tiny) shuffle;
- **driver state is k·dim ints per iteration** (the canonical broadcast-
  centroid shape, same as Spark MLlib KMeans) — the N-row data never
  leaves executors and is scanned exactly once per iteration.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 1000

# assign_expr unrolls its argmin into k parallel subtrees up to this k;
# above it the compile-time cost of k fresh-literal subtrees per Lloyd
# iteration outweighs the interpreted outer-lambda it removes (measured:
# unroll 1.6× faster at k=8, ~2× slower at the PQ m=4·k=16 shape).
_UNROLL_MAX_K = 8


def quantize_vec(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """array<float> -> array<bigint>, element = round(double(x) · scale).

    The cast to double BEFORE the multiply matters for oracle parity:
    float·int would round the product to float precision, which can flip
    round-to-int on values near an x.5 boundary; double math here is
    bit-identical to the oracle's ``CAST(x AS DOUBLE) * scale``.

    The rounding is the shared exact fixed-point quantizer
    (functions/fixedpoint.qlong): arithmetic only, measured ~4× faster
    per element than ``F.round`` (whose codegen allocates a BigDecimal
    via Double.toString per element), exact binary half-away-from-zero
    for |x·scale| < 2^52 including the ulp/2 window below each .5
    boundary (overshoot-corrected — proof in the fixedpoint module).
    Verified element-for-element against F.round on the fixture
    embeddings.
    """
    from oeem_etl_spark.functions.fixedpoint import qlong

    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: qlong(x.cast("double"), scale))


def _sqdist_lit(vec: Column, centroid: list[int]) -> Column:
    """Exact int64 squared-L2 distance between a quantized vector column
    and a literal centroid (folded into the plan — no join)."""
    carr = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    diffs = F.zip_with(vec, carr, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign_expr(vec: Column, centroids: list[list[int]]) -> Column:
    """Argmin-over-centroids as a single map-side expression.

    array_min over struct(dist, cid) compares dist first, then cid —
    exact-integer distances make the argmin total-ordered and ties break
    to the smallest cluster id, matching the oracle's
    ``row_number() OVER (ORDER BY dist, cid)``.

    Literal shape (three measured regimes, r9 tuning): k·dim SCALAR
    literal nodes made Janino recompile ~2 s/iteration (fresh literal
    values -> no codegen-cache hit); a single array<array<bigint>>
    matrix literal fixes analysis cost but forces the OUTER centroid
    loop through an interpreted ``transform`` lambda per row; unrolling
    the argmin as k per-centroid ARRAY literals drops that outer lambda
    (measured 1.6× faster per pass at k=8/dim=64) but re-inflates the
    expression tree k-fold — at the PQ shape (m=4 subspaces × k=16
    codes = 64 unrolled subtrees per plan, fresh literals every Lloyd
    iteration) compile time dominates and the end-to-end query ran
    ~2× SLOWER. So: unroll for small k (≤ ``_UNROLL_MAX_K``), keep the
    single matrix literal above it. Element-identical output either
    way — the arithmetic and the (d, c) tie-break are unchanged.
    """
    if len(centroids) <= _UNROLL_MAX_K:
        cells = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.lit([int(v) for v in c]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(j).cast("int").alias("c"),
                )
                for j, c in enumerate(centroids)
            ]
        )
        return F.array_min(cells)["c"]
    m = F.lit([[int(v) for v in c] for c in centroids])
    cells = F.transform(
        m,
        lambda c, j: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            j.cast("int").alias("c"),
        ),
    )
    return F.array_min(cells)["c"]


def _round_half_away(v: float) -> int:
    """round-half-away-from-zero on the double's exact value — matches
    Spark ROUND and DuckDB ROUND; Decimal avoids the floor(x+0.5)
    float-boundary pitfall."""
    return int(Decimal(v).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _lloyd(qdf: DataFrame, centroids: list[list[int]], iters: int) -> list[list[int]]:
    """Run ``iters`` Lloyd iterations; returns the updated centroid list.

    Each iteration: map-only argmin assignment, then centroid update as one
    grouped aggregation whose k·dim result is collected to the driver
    (tiny, by construction) and re-folded into the next iteration's plan as
    literals. An empty cluster keeps its previous centroid. New centroid
    element = round(sum/count) — centroids stay on the same integer grid as
    the data (fixed-point k-means), which keeps iteration N+1 exact.
    """
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = qdf.select(
            assign_expr(F.col("__qv"), centroids).alias("__c"), "__qv"
        )
        cells = (
            assigned.select("__c", F.posexplode("__qv").alias("__p", "__v"))
            .groupBy("__c", "__p")
            .agg(F.sum("__v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # k·dim cells — driver-held by design
        )
        upd: dict[int, dict[int, int]] = {}
        for r in cells:
            upd.setdefault(r["__c"], {})[r["__p"]] = _round_half_away(r["s"] / r["n"])
        centroids = [
            [upd[j][p] for p in range(dim)] if j in upd else centroids[j]
            for j in range(len(centroids))
        ]
    return centroids


def kmeans_assign(
    df: DataFrame,
    key: str,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = DEFAULT_SCALE,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means; returns (key, cluster int).

    Init: centroids are the quantized vectors of the ``k`` smallest keys
    (cid = rank order); see ``_lloyd`` for the iteration shape.

    ``max_cluster_size`` (the skewed-cluster mitigation the SemDeDup pair
    stage needs — n_c² blows up on a dominant cluster): any cluster whose
    final size exceeds it is re-clustered locally into
    ``ceil(size / max_cluster_size)`` sub-clusters, seeded from the
    cluster's smallest keys (same deterministic rule as the global init)
    and assigned by the same exact-integer argmin. Cluster ids are then
    densely renumbered on the driver (non-split clusters keep one id,
    split clusters get one per sub-seed), so downstream grouping is
    unchanged in shape. The extra driver state is (Σ splits)·dim ints and
    the extra work is one count, one bounded seed collect, and one more
    map-only assignment pass — no new shuffle of data rows.
    """
    from pyspark.storagelevel import StorageLevel

    qdf = df.select(F.col(key).alias("__k"), quantize_vec(vec_col, scale).alias("__qv"))
    # The quantized frame is consumed by EVERY pass (seed scan, each
    # Lloyd iteration, the final assignment, and the split passes):
    # persist it so quantization and the upstream scan run once, not
    # 3+iters times (scale: one row of ints per vector; spills to disk;
    # released by the ContextCleaner with the returned frame).
    qdf = qdf.persist(StorageLevel.MEMORY_AND_DISK)
    seed = qdf.orderBy("__k").limit(k).collect()  # k rows — driver-held by design
    centroids = _lloyd(qdf, [list(r["__qv"]) for r in seed], iters)
    assign = assign_expr(F.col("__qv"), centroids)
    if max_cluster_size is None:
        return qdf.select(F.col("__k").alias(key), assign.alias("cluster"))

    assigned = qdf.select("__k", "__qv", assign.alias("__c"))
    sizes = {r["__c"]: r["n"] for r in assigned.groupBy("__c").agg(
        F.count(F.lit(1)).alias("n")).collect()}  # ≤ k rows
    splits = {
        c: -(-n // max_cluster_size) for c, n in sizes.items() if n > max_cluster_size
    }
    if not splits:
        return assigned.select(F.col("__k").alias(key), F.col("__c").alias("cluster"))

    # One MAP-ONLY job collects every oversized cluster's sub-seeds: keep
    # rows whose key-hash lands on a per-cluster stride (expected yield =
    # split count). Deterministic (xxhash64 is seed-stable), spreads seeds
    # quasi-randomly across the cluster, and — unlike a row_number window —
    # never shuffles the dominant clusters' rows into #oversized tasks,
    # which would be its own skew cliff at scale. Clusters that draw < 2
    # seeds (possible, hash variance) stay unsplit this pass.
    strides = {c: -(-sizes[c] // s) for c, s in splits.items()}
    stride_map = F.create_map(
        *[F.lit(x) for c, st in strides.items() for x in (int(c), int(st))]
    )
    seed_rows = (
        assigned.where(F.col("__c").isin([int(c) for c in splits]))
        .where(F.pmod(F.xxhash64("__k"), F.element_at(stride_map, F.col("__c"))) == 0)
        .collect()  # ~Σ splits rows — driver-held by design
    )
    sub_centroids: dict[int, list[list[int]]] = {}
    for r in sorted(seed_rows, key=lambda r: (r["__c"], r["__k"])):
        sub_centroids.setdefault(r["__c"], []).append(list(r["__qv"]))
    splits = {c: len(v) for c, v in sub_centroids.items() if len(v) >= 2}
    if not splits:
        return assigned.select(F.col("__k").alias(key), F.col("__c").alias("cluster"))

    # Dense renumbering: non-split cluster -> one id; split cluster ->
    # base id + local argmin over its sub-seeds. Pure driver arithmetic.
    base: dict[int, int] = {}
    nxt = 0
    for c in sorted(sizes):
        base[c] = nxt
        nxt += splits.get(c, 1)
    final = None
    for c in sorted(sizes, reverse=True):
        cid = (
            F.lit(base[c]) + assign_expr(F.col("__qv"), sub_centroids[c])
            if c in splits
            else F.lit(base[c])
        )
        final = cid if final is None else F.when(F.col("__c") == c, cid).otherwise(final)
    return assigned.select(F.col("__k").alias(key), final.alias("cluster"))


def semantic_dedup_pairs(
    df: DataFrame,
    key: str,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    scale: int = DEFAULT_SCALE,
    n_salts: int = 8,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup: near-duplicate pairs found *within* k-means clusters.

    Returns (cluster, keep_id, drop_id, cos) — for each within-cluster
    pair with rounded cosine ≥ threshold, the larger key is the drop
    candidate (deterministic greedy-by-key policy). Survivors are
    ``df.join(pairs.select("drop_id"), key == drop_id, "left_anti")``.

    Scale: the pair join is equi-keyed on cluster, so work is
    O(Σ n_c²) — the k-fold reduction over all-pairs that makes
    embedding dedup feasible at corpus scale. ``max_cluster_size`` guards
    the skewed-cluster cliff: clusters above it are split locally (see
    ``kmeans_assign``) before pairing, bounding every n_c. True
    near-duplicates have near-identical embeddings, so they land in the
    same sub-cluster and the detected duplicate set is preserved (the
    SemDeDup recall argument, asserted in tests/test_clustering.py).

    The cluster id has only ``k`` distinct values, so a plain equi-join
    caps parallelism at k tasks regardless of cluster size — the join is
    therefore salted (``n_salts``, see operators/skew.py): the x side is
    replicated, the y side salted, and the dot-product stage fans out to
    k·n_salts partitions. Results are identical; set ``n_salts=1`` to
    disable.
    """
    from oeem_etl_spark.functions import vector

    clusters = kmeans_assign(df, key, vec_col, k, iters, scale, max_cluster_size)
    # Norms are hoisted to the sides BEFORE the pair join: one sqrt-norm
    # per vector instead of two per pair, so each pair costs one dot
    # product + a scalar multiply (3× less array work in the O(Σ n_c²)
    # stage). The float expression is identical to cosine() — dot /
    # (sqrt(Σx²)·sqrt(Σy²)) — so results are bit-equal to the unhoisted
    # form and the oracle. (r9 note: hoisting the float→double element
    # casts here as well was TRIED and reverted — the double arrays
    # doubled the salted pair join's shuffle bytes, a net loss: 4.1 →
    # 5.4 s end-to-end. Keep the 4-byte floats on the wire.)
    side = clusters.join(df.select(F.col(key), F.col(vec_col)), key).select(
        F.col("cluster"),
        F.col(key),
        F.col(vec_col),
        vector.norm(vec_col).alias("__n"),
    )
    # both pair sides read this frame: persist it or the k-means
    # assignment + norm pass runs twice (MEMORY_AND_DISK, released by
    # the ContextCleaner; one row per vector, linear in the corpus)
    from pyspark.storagelevel import StorageLevel

    side = side.persist(StorageLevel.MEMORY_AND_DISK)
    x = side.select(
        F.col("cluster"),
        F.col(key).alias("keep_id"),
        F.col(vec_col).alias("__vx"),
        F.col("__n").alias("__nx"),
    )
    y = side.select(
        F.col("cluster"),
        F.col(key).alias("drop_id"),
        F.col(vec_col).alias("__vy"),
        F.col("__n").alias("__ny"),
    )
    if n_salts > 1:
        from oeem_etl_spark.operators.skew import salted_join

        pairs = salted_join(y, x, on=["cluster"], n_salts=n_salts)
    else:
        pairs = x.join(y, ["cluster"])
    pairs = pairs.where(F.col("keep_id") < F.col("drop_id"))
    # r9 shape notes — two rewrites TRIED here and REVERTED with
    # measurements, kept as guard rails:
    # (1) staged dot-prefilter (cheap compare before the round):
    #     predicate pushdown substitutes the aliased dot expression into
    #     every pushed filter, so the dot evaluated 2-3× per pair —
    #     4.1 → 5.2 s. (2) arithmetic qlong round instead of F.round:
    #     qlong references its child 4-6×, and in this NON-codegen
    #     context (the dot is a HOF → CodegenFallback → no common-
    #     subexpression elimination) each reference re-evaluates the
    #     whole dot — 4.1 → 7.2 s. F.round's single child evaluation
    #     wins whenever the child is expensive; qlong is for cheap
    #     codegen'd children (dsum/davg sites). This single-filter form
    #     evaluates one dot per pair (filter pushed below the
    #     projection), and the projection re-evaluates only survivors.
    denom = F.col("__nx") * F.col("__ny")
    cos = F.round(
        F.when(denom != 0, vector.dot("__vx", "__vy") / denom), 6
    )
    return pairs.select(
        "cluster", "keep_id", "drop_id", cos.alias("cos")
    ).where(F.col("cos") >= threshold)

# ---------------------------------------------------------------------------
# Product quantization (PQ) — Jégou et al. 2011, "Product quantization for
# nearest neighbor search" (public method). Same fixed-point discipline as
# the k-means above, so training, encoding, AND the ADC distance are exact
# int64 arithmetic — deterministic, partitioning-independent, and
# oracle-checkable by unrolling the per-subspace Lloyd iterations in SQL.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    key: str,
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
    k_codes: int = 16,
    iters: int = 2,
    scale: int = DEFAULT_SCALE,
) -> list[list[list[int]]]:
    """Train ``m`` per-subspace codebooks of ``k_codes`` centroids each over
    the quantized grid; returns ``codebooks[m][k_codes][dim // m]`` ints.

    Seeding matches :func:`kmeans_assign`: the ``k_codes`` smallest keys'
    vectors, sliced per subspace (cid = rank order). The Lloyd arithmetic
    per subspace is exactly :func:`_lloyd`'s, but ALL ``m`` subspaces are
    trained in the same pass: each iteration is ONE job — an inline of
    (subspace, code, subvector) entries, posexplode, and a single
    map-side-combinable aggregation on (subspace, code, position) — so
    training costs ``iters`` corpus scans total, not ``m · iters``.
    Driver state is the codebook only (m · k_codes · sub ints ≈ 1 KB at
    64-dim/8-subspace).

    100 TB: production trains on a bounded deterministic sample (compose
    with splits.sql_hash_uniform upstream); encode/search never rescan
    more than once.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from pyspark.storagelevel import StorageLevel

    sub = dim // m
    qdf = df.select(quantize_vec(vec_col, scale).alias("__qvfull"), F.col(key))
    # seed scan + every Lloyd iteration re-reads this frame: persist so
    # the quantization/scan run once (same rationale as kmeans_assign)
    qdf = qdf.persist(StorageLevel.MEMORY_AND_DISK)
    seed_rows = (
        qdf.orderBy(key).limit(k_codes).collect()
    )  # k rows — driver-held by design
    if len(seed_rows) < k_codes:
        raise ValueError(
            f"pq_train needs at least k_codes={k_codes} input rows to seed "
            f"the codebooks; got {len(seed_rows)} — lower k_codes or feed "
            f"more vectors"
        )
    books: list[list[list[int]]] = [
        [list(r["__qvfull"])[j * sub : (j + 1) * sub] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(iters):
        entries = F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("__sp"),
                        assign_expr(
                            F.slice("__qvfull", j * sub + 1, sub), books[j]
                        ).alias("__c"),
                        F.slice("__qvfull", j * sub + 1, sub).alias("__sv"),
                    )
                    for j in range(m)
                ]
            )
        )
        cells = (
            qdf.select(entries)
            .select("__sp", "__c", F.posexplode("__sv").alias("__p", "__v"))
            .groupBy("__sp", "__c", "__p")
            .agg(F.sum("__v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # m·k·sub cells — driver-held by design
        )
        upd: dict[tuple[int, int], dict[int, int]] = {}
        for r in cells:
            upd.setdefault((r["__sp"], r["__c"]), {})[r["__p"]] = _round_half_away(
                r["s"] / r["n"]
            )
        books = [
            [
                [upd[(j, c)][p] for p in range(sub)]
                if (j, c) in upd
                else books[j][c]
                for c in range(k_codes)
            ]
            for j in range(m)
        ]
    qdf.unpersist()  # training output is driver-held; nothing references qdf
    return books


def pq_encode(
    df: DataFrame,
    key: str,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(key, pq_code array<int> of length m): per-subspace exact-integer
    argmin against the literal codebook — a pure map, no join, no
    shuffle. The encoded corpus is m bytes-ish per row (m small ints):
    the 100 TB candidate-generation working set is ~32× smaller than the
    float vectors it stands in for."""
    sub = len(codebooks[0][0])
    qv = df.select(F.col(key), quantize_vec(vec_col, scale).alias("__qv"))
    return qv.select(
        F.col(key),
        F.array(
            *[
                assign_expr(F.slice("__qv", j * sub + 1, sub), codebooks[j])
                for j in range(len(codebooks))
            ]
        ).alias("pq_code"),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    k: int,
    corpus_key: str = "vec_id",
    query_key: str = "q_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Asymmetric-distance top-k: each query precomputes one exact-int64
    LUT (m × k_codes squared-L2 cells against the literal codebooks),
    and a candidate's distance is m LUT lookups summed via
    zip_with(lut, pq_code) — no vector math on the corpus side at all.

    Scale shape: the corpus side carries ONLY (key, pq_code); the query
    side (with its LUT column) broadcasts. Ties break (adc_dist, key)
    ascending — total order, engine-independent."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    qv = queries.select(
        F.col(query_key), quantize_vec(vec_col, scale).alias("__qv")
    )
    def _sub_lut(j: int) -> Column:
        # k_codes exact-int64 squared-L2 cells for subspace j, as one
        # transform over the literal codebook (single array literal —
        # same codegen-cache rationale as assign_expr)
        return F.transform(
            F.lit([[int(v) for v in c] for c in codebooks[j]]),
            lambda c: F.aggregate(
                F.zip_with(
                    F.slice("__qv", j * sub + 1, sub),
                    c,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )

    lut = F.array(*[_sub_lut(j) for j in range(m)])
    qlut = qv.select(F.col(query_key), lut.alias("__lut"))
    joined = corpus_codes.crossJoin(F.broadcast(qlut))
    dist = F.aggregate(
        F.zip_with(
            "__lut", "pq_code", lambda lut_j, c: F.element_at(lut_j, c + 1)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        F.col(query_key), F.col(corpus_key), dist.alias("adc_dist")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_key).orderBy(
        F.col("adc_dist").asc(), F.col(corpus_key).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_key, corpus_key, "adc_dist", "rnk")
    )


def pq_search_refined(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    k: int,
    shortlist: int = 50,
    corpus_key: str = "vec_id",
    query_key: str = "q_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The production PQ shape: ADC shortlist (``shortlist`` candidates
    per query, codes only on the corpus side) followed by EXACT
    quantized-L2 re-ranking of just the shortlist against the float
    vectors. Recall lost to code coarseness comes back in the re-rank;
    the full-precision vectors are touched for shortlist · n_queries
    rows, never corpus · n_queries. Exact int64 end-to-end, so the
    whole pipeline (train → encode → ADC → re-rank) is
    oracle-checkable. Returns (query_key, corpus_key, l2q_dist, rnk)."""
    codes = pq_encode(corpus, corpus_key, codebooks, vec_col, scale)
    short = pq_adc_topk(
        codes, queries, codebooks, shortlist, corpus_key, query_key, vec_col, scale
    ).select(query_key, corpus_key)
    # Join FIRST, quantize after: the shortlist join drops all but
    # shortlist·n_queries corpus rows, so the re-rank quantization runs
    # on the survivors only instead of the full corpus (the projection
    # would otherwise be computed below the join for every corpus row).
    cq = corpus.select(F.col(corpus_key), F.col(vec_col).alias("__cvec"))
    qq = queries.select(
        F.col(query_key), quantize_vec(vec_col, scale).alias("__qq")
    )
    exact = F.aggregate(
        F.zip_with("__qq", quantize_vec("__cvec", scale), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_key).orderBy(
        F.col("l2q_dist").asc(), F.col(corpus_key).asc()
    )
    return (
        short.join(cq, corpus_key)
        .join(F.broadcast(qq), query_key)
        .select(F.col(query_key), F.col(corpus_key), exact.alias("l2q_dist"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_key, corpus_key, "l2q_dist", "rnk")
    )
