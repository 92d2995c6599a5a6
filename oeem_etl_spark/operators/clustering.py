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
    (cid = rank order); ``_lloyd`` documents the definitional iteration
    (and tests cross-check against it).

    r9 execution note (guide §4.2): the per-row work — quantization,
    k·dim argmin scoring, and the iteration's (cluster, pos) partial
    sums — runs in Arrow kernels (numpy int64) instead of Catalyst
    higher-order functions. HOFs are CodegenFallback: the interpreted
    argmin costs ~70 µs/row at k=8·dim=64 REGARDLESS of data size, and
    building the k·dim literal expression tree costs ~0.2-0.9 s of
    driver py4j calls per pass. The kernel arithmetic is exact int64
    (quantization via fixedpoint.qlong_np, the JVM quantizer's numpy
    twin; squared distances and sums are order-free integer math with
    the same wraparound as the JVM long path; argmin ties break to the
    first = smallest cid, the array_min struct order), so assignments
    and centroid updates are value-identical to the ``_lloyd``/
    ``assign_expr`` reference — pinned by
    tests/test_clustering.py::test_pq_train_matches_per_subspace_lloyd
    and the kmeans fixture tests. Scale shape is unchanged: assignment
    is a pure map (centroids ride the task closure), each update is one
    map-side partial aggregation collected as k·dim cells.

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

    raw = df.select(F.col(key).alias("__k"), F.col(vec_col).alias("__v"))
    # consumed by every pass (seed scan, each Lloyd iteration, the final
    # assignment, and the split passes): persist so the upstream scan
    # runs once (raw float rows — SMALLER than the quantized int64 form
    # the pre-r9 code cached; quantization is a cheap in-kernel numpy op)
    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    seed = raw.orderBy("__k").limit(k).collect()  # k rows — driver-held by design
    centroids = [_np_quantize_row(r["__v"], scale) for r in seed]
    centroids = _lloyd_np(raw, centroids, iters, scale)
    key_dt = dict(df.dtypes)[key]
    if max_cluster_size is None:
        return raw.mapInPandas(
            _assign_gen(centroids, scale, emit_qv=False),
            f"__k {key_dt}, cluster int",
        ).toDF(key, "cluster")

    assigned = raw.mapInPandas(
        _assign_gen(centroids, scale, emit_qv=True),
        f"__k {key_dt}, __qv array<bigint>, __c int",
    )
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
    # base id + local argmin over its sub-seeds. Pure driver arithmetic,
    # applied in a second map-only kernel over the assigned frame.
    base: dict[int, int] = {}
    nxt = 0
    for c in sorted(sizes):
        base[c] = nxt
        nxt += splits.get(c, 1)
    return assigned.mapInPandas(
        _refine_gen(base, {c: sub_centroids[c] for c in splits}),
        f"__k {key_dt}, cluster int",
    ).toDF(key, "cluster")


def _np_quantize_row(vec, scale: int) -> list[int]:
    """Driver-side quantization of one collected float row — the numpy
    twin of ``quantize_vec`` (same qlong arithmetic, proof in
    functions/fixedpoint)."""
    import numpy as np

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    return [int(v) for v in qlong_np(np.asarray(vec, dtype="float64"), scale)]


def _np_argmin_assign(Q, cents):
    """Exact-int64 argmin of squared L2 against ``cents`` (k, dim).

    Ties take the FIRST minimum (np.argmin), i.e. the smallest cluster
    id — identical to assign_expr's array_min over (dist, cid) structs.
    Chunked so the (chunk, k, dim) diff tensor stays ≤ ~8M cells."""
    import numpy as np

    C = np.asarray(cents, dtype="int64")
    n = Q.shape[0]
    out = np.empty(n, dtype="int32")
    chunk = max(1, 8_000_000 // max(1, C.shape[0] * C.shape[1]))
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        d = Q[i0:i1, None, :] - C[None, :, :]
        out[i0:i1] = (d * d).sum(axis=2).argmin(axis=1).astype("int32")
    return out


def _assign_gen(centroids, scale: int, emit_qv: bool):
    """mapInPandas generator: (key, vec) → assignment (+ quantized vec)."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            Q = qlong_np(X, scale)
            a = _np_argmin_assign(Q, centroids)
            if emit_qv:
                yield pd.DataFrame(
                    {
                        "__k": pdf.iloc[:, 0].to_numpy(),
                        "__qv": list(Q),
                        "__c": a,
                    }
                )
            else:
                yield pd.DataFrame(
                    {"__k": pdf.iloc[:, 0].to_numpy(), "cluster": a}
                )

    return gen


def _refine_gen(base: dict[int, int], subcents: dict[int, list[list[int]]]):
    """mapInPandas generator for the max_cluster_size re-split: rows of a
    split cluster get base[c] + local argmin over its sub-seeds; others
    keep base[c]. Same exact-int argmin as the global assignment."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = pdf["__c"].to_numpy()
            out = np.empty(len(c), dtype="int32")
            for cl in np.unique(c):
                m = c == cl
                b = base[int(cl)]
                if int(cl) in subcents:
                    Q = np.stack(pdf.loc[m, "__qv"].to_numpy()).astype("int64")
                    out[m] = b + _np_argmin_assign(Q, subcents[int(cl)])
                else:
                    out[m] = b
            yield pd.DataFrame({"__k": pdf["__k"].to_numpy(), "cluster": out})

    return gen


def _lloyd_np(raw: DataFrame, centroids: list[list[int]], iters: int,
              scale: int, vec_pos: int = 1) -> list[list[int]]:
    """Kernel twin of :func:`_lloyd` over the RAW (key, vec) frame: each
    iteration is one map-only job whose batches emit int64 partial
    (cluster, pos, sum, count) cells; the ≤ partitions·k·dim cells fold
    on the driver (python ints — exact), and the new centroid element is
    the same ``_round_half_away(sum / count)``. Value-identical to
    ``_lloyd`` (order-free integer sums; same argmin tie-break; same
    empty-cluster keep rule)."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    dim = len(centroids[0])
    k = len(centroids)
    for _ in range(iters):
        cents = [list(c) for c in centroids]

        def cells_gen(batches, _cents=cents):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf.iloc[:, vec_pos].to_numpy()).astype(np.float64)
                Q = qlong_np(X, scale)
                a = _np_argmin_assign(Q, _cents)
                kk, dd = len(_cents), Q.shape[1]
                S = np.zeros((kk, dd), dtype="int64")
                np.add.at(S, a, Q)
                n = np.bincount(a, minlength=kk)
                nz = np.nonzero(n)[0]
                yield pd.DataFrame(
                    {
                        "__c": np.repeat(nz, dd).astype("int32"),
                        "__p": np.tile(np.arange(dd, dtype="int32"), len(nz)),
                        "s": S[nz].reshape(-1),
                        "n": np.repeat(n[nz], dd),
                    }
                )

        cells = raw.mapInPandas(
            cells_gen, "__c int, __p int, s long, n long"
        ).collect()
        agg: dict[tuple[int, int], list[int]] = {}
        for r in cells:
            a0 = agg.setdefault((r["__c"], r["__p"]), [0, 0])
            a0[0] += r["s"]
            a0[1] += r["n"]
        upd: dict[int, dict[int, int]] = {}
        for (c, pos), (s, n) in agg.items():
            upd.setdefault(c, {})[pos] = _round_half_away(s / n)
        centroids = [
            [upd[j][p] for p in range(dim)] if j in upd else centroids[j]
            for j in range(k)
        ]
    return centroids


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

    Pair stage (r9 optimization, guide §4.2/§8): the within-cluster
    all-pairs cosine runs as ONE grouped Arrow kernel
    (``groupBy(cluster).applyInPandas``) instead of a salted self-join +
    per-pair interpreted HOF dot. Every vector crosses the Python
    boundary ONCE per cluster (O(N) bytes), never once per pair
    (O(Σ n_c²) bytes — the old join shipped both 64-float arrays for
    every pair), and the n_c² dot products are vectorized numpy instead
    of Catalyst ``aggregate``/``zip_with`` lambdas, which are
    CodegenFallback — interpreted, ~6 µs per 64-dim pair. Measured at
    sf0.1/k=8: the pair stage drops 1.2 s → 0.1 s with bit-identical
    output (1213/1213 rows, cos equal as doubles). The earlier r9
    JVM-side rewrites (staged dot-prefilter, arithmetic qlong round,
    hoisted double casts) were all measured SLOWER in the join form and
    reverted — the join form itself was the bottleneck.

    Bit-exactness argument: the kernel accumulates dot and norm in the
    SAME left-to-right index order as the old fold (one vectorized
    ``acc = acc + x_i·y_i`` step per dimension — IEEE ops in fold order,
    just batched across pairs), ``np.sqrt`` and the division are
    correctly rounded like their JVM counterparts, and the 6-dp rounding
    is the shared half-away-from-zero quantizer
    (streaming/ops.quantize_micros — exact-binary ROUND, = DuckDB ROUND,
    = F.round everywhere off the shortest-decimal-repr tie window, which
    the fixture sweeps confirm empty). Pairs whose denom is 0 are
    dropped (the old NULL-cos ≥ threshold filter), and NaN inputs can
    never pass any threshold ≥ −1 on either path.

    ``n_salts`` is retained for API stability but unused: the old
    equi-join capped parallelism at k tasks and needed salting; the
    grouped kernel's parallelism is likewise the cluster count, with
    per-cluster work bounded by ``max_cluster_size`` (the same guard the
    salted join relied on for its own skew cap) and kernel memory
    bounded by a fixed-size row-block loop.
    """
    del n_salts  # parallelism/skew now governed by cluster grouping
    clusters = kmeans_assign(df, key, vec_col, k, iters, scale, max_cluster_size)
    side = clusters.join(df.select(F.col(key), F.col(vec_col)), key).select(
        F.col("cluster"), F.col(key), F.col(vec_col)
    )
    key_dt = dict(side.dtypes)[key]
    kernel = _pair_cos_kernel(key, vec_col, float(threshold))
    return side.groupBy("cluster").applyInPandas(
        kernel, f"cluster int, keep_id {key_dt}, drop_id {key_dt}, cos double"
    )


def _pair_cos_kernel(key: str, vec_col: str, threshold: float):
    """Per-cluster all-pairs cosine kernel for :func:`semantic_dedup_pairs`.

    Rows are sorted by key so (i < j) positions are exactly the
    keep_id < drop_id pairs. Dot/norm accumulate dimension-by-dimension
    (fold order — see the caller's bit-exactness note); the pair matrix
    is processed in row blocks of ≤ ~1M cells so kernel memory stays
    bounded for any cluster size the ``max_cluster_size`` guard admits.
    """
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.streaming.ops import quantize_micros

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cluster": pd.Series([], dtype="int32"),
                "keep_id": pd.Series([], dtype=pdf[key].dtype),
                "drop_id": pd.Series([], dtype=pdf[key].dtype),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values(key, kind="mergesort")
        keys = pdf[key].to_numpy()
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        dim = X.shape[1]
        nacc = np.zeros(n)
        for t in range(dim):  # fold-order norm² accumulation
            nacc = nacc + X[:, t] * X[:, t]
        norms = np.sqrt(nacc)
        cl = int(pdf["cluster"].iloc[0])
        out_k, out_d, out_c = [], [], []
        block = max(1, 1_000_000 // n)
        cols = np.arange(n)
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            acc = np.zeros((i1 - i0, n))
            for t in range(dim):  # fold-order dot accumulation
                acc = acc + X[i0:i1, t][:, None] * X[:, t][None, :]
            denom = norms[i0:i1][:, None] * norms[None, :]
            upper = cols[None, :] > np.arange(i0, i1)[:, None]
            valid = upper & (denom != 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                cosv = np.where(valid, acc / np.where(denom == 0, 1.0, denom), 0.0)
            q = quantize_micros(cosv) / 1e6
            sel = valid & (q >= threshold)
            if sel.any():
                rows, jcols = np.nonzero(sel)
                out_k.append(keys[rows + i0])
                out_d.append(keys[jcols])
                out_c.append(q[sel])
        if not out_k:
            return empty
        return pd.DataFrame(
            {
                "cluster": np.full(sum(len(a) for a in out_k), cl, dtype="int32"),
                "keep_id": np.concatenate(out_k),
                "drop_id": np.concatenate(out_d),
                "cos": np.concatenate(out_c),
            }
        )

    return kernel

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
    raw = df.select(F.col(key).alias("__k"), F.col(vec_col).alias("__v"))
    # seed scan + every Lloyd iteration re-reads this frame: persist so
    # the upstream scan runs once (same rationale as kmeans_assign; raw
    # floats — quantization happens in-kernel, see below)
    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    seed_rows = (
        raw.orderBy("__k").limit(k_codes).collect()
    )  # k rows — driver-held by design
    if len(seed_rows) < k_codes:
        raise ValueError(
            f"pq_train needs at least k_codes={k_codes} input rows to seed "
            f"the codebooks; got {len(seed_rows)} — lower k_codes or feed "
            f"more vectors"
        )
    seeds_q = [_np_quantize_row(r["__v"], scale) for r in seed_rows]
    books: list[list[list[int]]] = [
        [q[j * sub : (j + 1) * sub] for q in seeds_q] for j in range(m)
    ]
    # r9 (guide §4.2, same rationale as kmeans_assign): each iteration is
    # ONE map-only Arrow-kernel job — every batch quantizes, scores all m
    # subspaces with the exact-int64 argmin, and emits (subspace, code,
    # pos) partial sums; the ≤ partitions·m·k·sub cells fold on the
    # driver. The pre-r9 inline/posexplode form paid ~0.9 s of driver
    # py4j expression construction (4 subspaces × k=16 matrix-literal
    # HOF trees) plus interpreted per-row argmin (~70 µs/row) PER
    # ITERATION; the kernel pays neither. Integer sums are order-free,
    # so cells (and thus books) are value-identical — pinned against the
    # definitional _lloyd form by test_pq_train_matches_per_subspace_lloyd.
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    for _ in range(iters):
        bks = [list(map(list, b)) for b in books]

        def cells_gen(batches, _bks=bks):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                Q = qlong_np(X, scale)
                frames = []
                for j, B in enumerate(_bks):
                    Qs = Q[:, j * sub : (j + 1) * sub]
                    a = _np_argmin_assign(Qs, B)
                    S = np.zeros((k_codes, sub), dtype="int64")
                    np.add.at(S, a, Qs)
                    n = np.bincount(a, minlength=k_codes)
                    nz = np.nonzero(n)[0]
                    frames.append(pd.DataFrame(
                        {
                            "__sp": np.full(len(nz) * sub, j, dtype="int32"),
                            "__c": np.repeat(nz, sub).astype("int32"),
                            "__p": np.tile(np.arange(sub, dtype="int32"), len(nz)),
                            "s": S[nz].reshape(-1),
                            "n": np.repeat(n[nz], sub),
                        }
                    ))
                yield pd.concat(frames, ignore_index=True)

        cells = raw.mapInPandas(
            cells_gen, "__sp int, __c int, __p int, s long, n long"
        ).collect()
        agg: dict[tuple[int, int, int], list[int]] = {}
        for r in cells:
            a0 = agg.setdefault((r["__sp"], r["__c"], r["__p"]), [0, 0])
            a0[0] += r["s"]
            a0[1] += r["n"]
        upd: dict[tuple[int, int], dict[int, int]] = {}
        for (j, c, pos), (s, n) in agg.items():
            upd.setdefault((j, c), {})[pos] = _round_half_away(s / n)
        books = [
            [
                [upd[(j, c)][p] for p in range(sub)]
                if (j, c) in upd
                else books[j][c]
                for c in range(k_codes)
            ]
            for j in range(m)
        ]
    raw.unpersist()  # training output is driver-held; nothing references raw
    return books


def pq_encode(
    df: DataFrame,
    key: str,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(key, pq_code array<int> of length m): per-subspace exact-integer
    argmin against the codebook — a pure map, no join, no shuffle. The
    encoded corpus is m bytes-ish per row (m small ints): the 100 TB
    candidate-generation working set is ~32× smaller than the float
    vectors it stands in for.

    r9: the per-row scoring runs as an Arrow kernel (numpy int64 — same
    exactness/tie-break argument as kmeans_assign; the codebooks ride
    the task closure) instead of m interpreted matrix-literal argmin
    HOFs per row."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    sub = len(codebooks[0][0])
    m = len(codebooks)
    bks = [list(map(list, b)) for b in codebooks]
    key_dt = dict(df.dtypes)[key]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            Q = qlong_np(X, scale)
            codes = np.empty((len(pdf), m), dtype="int32")
            for j, B in enumerate(bks):
                codes[:, j] = _np_argmin_assign(Q[:, j * sub : (j + 1) * sub], B)
            yield pd.DataFrame(
                {"__k": pdf.iloc[:, 0].to_numpy(), "pq_code": list(codes)}
            )

    return (
        df.select(F.col(key).alias("__k"), F.col(vec_col))
        .mapInPandas(gen, f"__k {key_dt}, pq_code array<int>")
        .toDF(key, "pq_code")
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
    LUT (m × k_codes squared-L2 cells against the codebooks), and a
    candidate's distance is m LUT lookups summed — no vector math on the
    corpus side at all.

    Scale shape: the corpus side carries ONLY (key, pq_code); the query
    side is bounded by the broadcast contract and rides the kernel task
    closure as precomputed LUTs (collected like the codebooks/centroids
    themselves — the pre-r9 form broadcast a LUT column instead, paying
    ~0.8 s of driver py4j expression construction for the m transform/
    aggregate trees plus an interpreted fold per (candidate × query)
    row). The kernel fans each corpus batch out across the queries and
    sums the lookups in vectorized int64 — order-free exact integers,
    value-identical to the fold. Ties break (adc_dist, key) ascending —
    total order, engine-independent."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.functions.fixedpoint import qlong_np

    sub = len(codebooks[0][0])
    m = len(codebooks)
    q_rows = queries.select(F.col(query_key), F.col(vec_col)).collect()
    # (qid, (m, k_codes) int64 LUT) in collected order; duplicate qids
    # fan out exactly like the old broadcast join
    B = np.asarray([[list(c) for c in b] for b in codebooks], dtype="int64")
    luts = []
    for r in q_rows:
        q = qlong_np(np.asarray(r[vec_col], dtype="float64"), scale)
        diff = q.reshape(m, 1, sub) - B  # (m, k_codes, sub)
        luts.append((r[query_key], (diff * diff).sum(axis=2)))

    q_dt = dict(queries.dtypes)[query_key]
    c_dt = dict(corpus_codes.dtypes)[corpus_key]

    def gen(batches):
        for pdf in batches:
            if not len(pdf) or not luts:
                continue
            codes = np.stack(pdf["pq_code"].to_numpy()).astype("int64")
            keys = pdf.iloc[:, 0].to_numpy()
            frames = []
            for qid, lut in luts:
                dist = lut[np.arange(m)[:, None], codes.T].sum(axis=0)
                frames.append(pd.DataFrame(
                    {"__q": qid, "__k": keys, "adc_dist": dist}
                ))
            yield pd.concat(frames, ignore_index=True)

    scored = corpus_codes.select(F.col(corpus_key), "pq_code").mapInPandas(
        gen, f"__q {q_dt}, __k {c_dt}, adc_dist long"
    ).toDF(query_key, corpus_key, "adc_dist")
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
