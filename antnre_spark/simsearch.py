"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, one pass, JVM-side arithmetic
  (zip_with + aggregate), TakeOrderedAndProject for the top-k — no global
  sort materialization. Scales as a full scan: right answer for one-off
  queries and for verifying the approximate path.
- LSH-bucketed top-k: random-hyperplane buckets (shared with
  dedup.cosine_dup_pairs); probes only the query's bucket (optionally
  multi-probe neighbors at Hamming distance 1) — the 100 TB path where a
  full scan per query is not affordable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from antnre_spark.hashing import plane_weights


def _dot_with_lit(vec: Column, query: list[float]) -> Column:
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec, qlit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _query_norm(vec: Column) -> Column:
    """Query-side norm with the zero guard the single-query paths apply
    driver-side (``math.sqrt(...) or 1.0``): an all-zero query vector
    yields cosine 0.0 rows, not NaNs that Spark sorts above every real
    neighbor (r4 self-review)."""
    n = _norm(vec)
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector; ties -> lowest id."""
    import math

    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    v = F.col(vec_col)
    cos = _dot_with_lit(v, query) / (_norm(v) * F.lit(qn))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_scores_pruned(
    df: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: float = 1.1e-6,
) -> DataFrame:
    """Map-side pruned EXACT bulk cosine scoring (r8, guide §4.2/§8):
    for every driver-side query vector, each input batch emits only the
    rows whose UNROUNDED cosine is within ``margin`` of the batch's k-th
    largest — a provable superset of any global ``round(cosine, 6)``
    top-k. This replaces a |queries| x |corpus| cross join whose pairs
    each paid an interpreted fold and a joined-row copy; the kernel is
    one numpy pass per batch and ships only candidate rows back.

    Correctness: cosines are computed in the exact fold order of the
    Spark expression ``dot / (norm * query_norm)`` (_fold_dots — bit-
    identical doubles), and the FINAL rounding + ranking stay in the
    JVM (caller applies F.round + a window), so rounding semantics are
    Spark's own. Superset proof: round6 moves a value by at most
    ~5.1e-7, so c >= c' + 1.1e-6 forces round6(c) > round6(c'); a row
    dropped by the batch threshold therefore has >= k rows with a
    strictly larger rounded cosine in its own batch and can never enter
    the global rounded top-k. Non-finite cosines (zero-norm corpus
    rows -> NaN, which Spark sorts ABOVE every double in a descending
    window) are kept unconditionally.

    Preconditions (matching every call site and the data asserts): the
    corpus holds >= k rows with finite cosines per query, and degenerate
    rows/queries (length mismatch, null elements) do not occur — the
    legacy cross join gave those NULL cosines, which only rank when
    fewer than k finite candidates exist. Queries are driver-side
    (query_id, vector) tuples and must be bounded (the same assumption
    the broadcast join made); query norms use the same sqrt-of-fold.
    Output: (query_id long, <id_col> as in df, cosine double UNROUNDED).
    """
    import math

    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    src = df.select(id_col, vec_col)
    out_schema = StructType(
        [
            StructField("query_id", LongType(), True),
            src.schema[id_col],
            StructField("cosine", DoubleType(), True),
        ]
    )
    dims = {len(q) for _qid, q in query_rows}
    if len(dims) > 1:
        raise ValueError("mixed query dims unsupported — filter first")
    dim = dims.pop() if dims else 0
    Q = np.array([q for _qid, q in query_rows], dtype=np.float64).reshape(
        len(query_rows), dim
    )
    qids = np.array([qid for qid, _q in query_rows], dtype=np.int64)
    qn = np.array(
        [math.sqrt(_py_fold_sumsq(q)) for _qid, q in query_rows],
        dtype=np.float64,
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or not len(qids):
                continue
            vecs = pdf[vec_col]
            n = len(vecs)
            lens = np.fromiter((len(x) for x in vecs), dtype=np.int64, count=n)
            main = lens == dim
            if not main.any():
                continue
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in vecs[main]]
            )
            ids = pdf[id_col].values[main]
            with np.errstate(invalid="ignore", divide="ignore"):
                nn = np.sqrt(_fold_sumsq(X))
                c = _fold_dots(X, Q) / (nn[:, None] * qn[None, :])
            nk = X.shape[0] - k
            if nk > 0:
                thr = np.partition(c, nk, axis=0)[nk, :]
                with np.errstate(invalid="ignore"):
                    mask = c >= (thr[None, :] - margin)
            else:
                mask = np.ones_like(c, dtype=bool)
            mask |= ~np.isfinite(c)
            ri, qi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "query_id": qids[qi],
                    id_col: ids[ri],
                    "cosine": c[ri, qi],
                }
            )

    return src.mapInPandas(score, out_schema)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Deterministic random-hyperplane sign bucket (no UDF): one character
    per plane, '1' iff vec . w_p >= 0. ``planes`` comes from
    hashing.plane_weights — plain float literals, so the identical bucket
    expression is writable in any engine (the DuckDB oracle embeds the same
    repr() literals). vec length must equal the plane dimension."""

    def plane_dot(w: list[float]) -> Column:
        wlit = F.array(*[F.lit(float(x)) for x in w])
        return F.aggregate(
            F.zip_with(vec, wlit, lambda x, wv: x * wv),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    return F.concat_ws(
        "",
        *[F.when(plane_dot(w) >= 0, "1").otherwise("0") for w in planes],
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """One tiny job to read the vector width when the caller doesn't know
    it (null rows skipped). Prefer passing ``dim`` explicitly in
    production plans — this probe executes the upstream plan once."""
    row = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") > 0))
        .first()
    )
    if row is None:
        raise ValueError(
            f"cannot infer dim: no non-null {vec_col} rows — pass dim="
        )
    return int(row["d"])


def bucketed_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Materializable ANN index: (bucket, id, vec, norm). Write this
    partitioned by bucket; queries prune to one partition.

    Null and zero-norm vectors are EXCLUDED: a zero vector has no
    direction, so no cosine neighbor rank — and under ANSI mode (Spark 4
    default) its norm-0 row would turn every query that probes its
    bucket into a divide-by-zero job failure (r4 self-review)."""
    planes = plane_weights(dim or _infer_dim(df, vec_col), n_planes)
    v = F.col(vec_col)
    return (
        df.filter(v.isNotNull())
        .select(
            hyperplane_bucket(v, planes).alias("bucket"),
            F.col(id_col),
            v.alias(vec_col),
            _norm(v).alias("norm"),
        )
        .filter(F.col("norm") > 0.0)
    )


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """IVF coarse quantizer: seeded Lloyd k-means over a DETERMINISTIC
    HASH sample — the sample_size rows with the smallest md5(id) values.
    Hash order is reproducible across runs, partitionings AND engines
    (DuckDB md5 is identical, so the oracle twin reconstructs the exact
    sample), and unlike the r2 orderBy(id).limit(n) it is UNBIASED: low
    ids are whatever rows were ingested first, md5 order is uniform over
    the corpus, so the sample sees the true density. Execution shape is
    TakeOrdered: each scan task keeps a sample_size-row heap and only
    those heaps travel to the driver — one pass, no shuffle, O(tasks *
    sample_size) driver merge; at 100 TB pre-filter with
    curate.deterministic_sample (same md5 family, pushed to the scan) so
    the heaps run over a thin slice instead of every row.

    Centroids come back as plain floats rounded to 6 decimals so the
    SAME literals drive assignment in Spark, DuckDB, and the python
    probe computation. Driver-side numpy Lloyd on the bounded sample;
    for a corpus-scale refresh run refine_centroids (distributed
    assignment + groupBy(cell) means) on the result.
    """
    import numpy as np

    rows = (
        df.orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    return kmeans_from_points(X, n_centroids, iters, seed)


def refine_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    rounds: int = 1,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd refresh: re-estimate each centroid as the mean
    of ALL vectors assigned to its cell (assignment by the same ivf_cell
    literal expression the index uses). This is the corpus-scale training
    path the sample-only quantizer lacks: the 256-row sample fixes the
    topology, >=1 full-data round moves centroids to the true cell means
    a sample cannot represent at 100 TB.

    Cost per round: one scan + one groupBy(cell) shuffle of dim partial
    sums per cell (map-side combined — bytes shuffled are O(cells * dim *
    tasks), never O(rows)). Empty cells keep their previous centroid.

    Determinism note: double addition is not associative, so cross-
    partitioning runs can differ in the last ulp before the 6-decimal
    round; same-layout runs are exactly reproducible. The driver-demo
    oracle therefore pins refine rounds to 0; this path is for real
    corpora where quantizer quality beats last-ulp reproducibility."""
    dim = len(centroids[0])
    cents = [list(c) for c in centroids]
    # only full-dimension, non-null vectors participate: a null embedding
    # would yield a null cell (driver TypeError on cents[None - 1]) and a
    # short vector makes F.element_at(v, i+1) throw under ANSI mode —
    # same hygiene as cosine_dup_pairs_banded's nrm > 0 pre-filter
    clean = df.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    )
    for _ in range(rounds):
        v = F.col(vec_col)
        agg = (
            clean.select(ivf_cell(v, cents).alias("cell"), v.alias("v"))
            .groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        for r in agg:
            if r["cell"] is None or not r["n"]:
                continue
            cents[r["cell"] - 1] = [
                round(float(r[f"s{i}"] / r["n"]), 6) for i in range(dim)
            ]
    return cents


def kmeans_from_points(
    X, n_centroids: int = 16, iters: int = 10, seed: int = 42
) -> list[list[float]]:
    """numpy Lloyd core (no Spark) — shared by kmeans_centroids and the
    DuckDB oracle builder so both derive bit-identical centroids from the
    same sample."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError(f"sample ({len(X)}) smaller than n_centroids")
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), n_centroids, replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # [n, K]
        assign = d.argmin(axis=1)
        for k in range(n_centroids):
            members = X[assign == k]
            if len(members):
                C[k] = members.mean(axis=0)
    return [[round(float(x), 6) for x in c] for c in C]


def _sq_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances to each centroid via
    ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 — the exact formula the DuckDB
    oracle uses (list_sum/list_dot_product), so the argmin cell assignment
    is bit-identical across engines.

    Kept in the compact higher-order-function form ON PURPOSE (r8): an
    unrolled 16-centroid x 64-dim chain is ~2000 expression nodes that
    the optimizer re-walks per action and janino must compile per plan —
    measured as tens of seconds of driver-side planning at sf1.0. The
    HOF form is interpreted but tiny, and every hot path now assigns
    cells via the numpy kernel (ivf_index arrow path) instead; this
    expression only runs on bounded query sets (ivf_probe_cells) and in
    refine_centroids."""
    vv = F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x)
    dists = []
    for c in centroids:
        cc = float(sum(x * x for x in c))
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]), lambda x, w: x * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        dists.append(vv - 2 * dot + F.lit(cc))
    return F.array(*dists)


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """1-based index of the nearest centroid (ties -> lowest index, the
    first-position rule both engines share)."""
    d = _sq_dists(vec, centroids)
    return F.array_position(d, F.array_min(d)).cast("int")


def _fold_dots(X, W):
    """[n, d] x [m, d] -> [n, m] dot products in the EXACT left-fold
    summation order of the Spark expression
    ``F.aggregate(F.zip_with(...), lit(0.0), acc + x)``: one vectorized
    elementwise pass per dimension, sequential across dimensions.
    Bit-identical to the JVM fold — unlike BLAS matmul, whose summation
    order (blocking, FMA) is unspecified."""
    import numpy as np

    acc = np.zeros((X.shape[0], W.shape[0]), dtype=np.float64)
    for i in range(X.shape[1]):
        acc += X[:, i, None] * W[None, :, i]
    return acc


def _fold_sumsq(X):
    """[n, d] -> [n] sum of squares in exact fold order (see _fold_dots)."""
    import numpy as np

    acc = np.zeros(X.shape[0], dtype=np.float64)
    for i in range(X.shape[1]):
        acc += X[:, i] * X[:, i]
    return acc


def _py_fold_sumsq(vals) -> float:
    """Scalar twin of _fold_sumsq for odd-length rows (python floats ARE
    IEEE doubles, so the fold is the same arithmetic)."""
    acc = 0.0
    for x in vals:
        acc = acc + float(x) * float(x)
    return acc


def ivf_index(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> DataFrame:
    """Materializable IVF index: (cell, id, vec, norm). Write partitioned
    by cell; a query prunes to nprobe cells. Complements the hyperplane-LSH
    index: IVF cells adapt to the data distribution (k-means), LSH buckets
    are data-independent — at 100 TB you pick per corpus shape.

    r8 (guide §4.2): cell assignment + norm run as a numpy mapInPandas
    kernel (``arrow=True``) instead of the 16-centroid interpreted
    higher-order-function expression — same values (exact fold order,
    _fold_dots), ~50x less per-row cost and no giant expression tree for
    the optimizer to re-walk. The kernel requires array<double> vectors;
    other element types keep the expression path. Rows whose vector
    length differs from the centroid dim get cell NULL and their own-
    length norm, exactly as the legacy expression produced (null dot
    poisons every distance; the norm fold runs over the row's own
    elements). Rows with null/NaN elements produce a NaN norm in the
    kernel where the expression produced NULL — indistinguishable after
    the ``norm > 0.0`` filter both paths apply, which is the only place
    such rows can go."""
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    v = F.col(vec_col)
    dim = len(centroids[0])
    elem_t = None
    try:
        elem_t = df.schema[vec_col].dataType.elementType
    except Exception:
        pass
    if arrow and isinstance(elem_t, DoubleType):
        clean = df.filter(v.isNotNull()).select(id_col, vec_col)
        C = np.array(centroids, dtype=np.float64)
        # the exact ||c||^2 literals the expression path embeds (python
        # sum() is the same left fold)
        cc = np.array(
            [sum(x * x for x in c) for c in centroids], dtype=np.float64
        )
        out_schema = StructType(
            [
                StructField("cell", IntegerType(), True),
                clean.schema[id_col],
                clean.schema[vec_col],
                StructField("norm", DoubleType(), True),
            ]
        )

        def assign(batches):
            import pandas as pd

            for pdf in batches:
                if pdf.empty:
                    continue
                vecs = pdf[vec_col]
                n = len(vecs)
                lens = np.fromiter(
                    (len(x) for x in vecs), dtype=np.int64, count=n
                )
                cell = np.full(n, -1, dtype=np.int64)
                norm = np.empty(n, dtype=np.float64)
                main = lens == dim
                if main.any():
                    X = np.stack(
                        [np.asarray(x, dtype=np.float64) for x in vecs[main]]
                    )
                    vv = _fold_sumsq(X)
                    with np.errstate(invalid="ignore"):
                        d = (vv[:, None] - 2.0 * _fold_dots(X, C)) + cc[None, :]
                        cell[main] = np.argmin(d, axis=1) + 1
                        norm[main] = np.sqrt(vv)
                odd = ~main
                if odd.any():
                    import math

                    for j in np.flatnonzero(odd):
                        norm[j] = math.sqrt(_py_fold_sumsq(vecs.iloc[j]))
                yield pd.DataFrame(
                    {
                        "cell": pd.array(
                            [int(c) if c > 0 else None for c in cell],
                            dtype="Int32",
                        ),
                        id_col: pdf[id_col].values,
                        vec_col: vecs.values,
                        "norm": norm,
                    }
                )

        return clean.mapInPandas(assign, out_schema).filter(
            F.col("norm") > 0.0
        )
    # expression path: null/zero-norm vectors excluded, same reasoning as
    # bucketed_index
    return (
        df.filter(v.isNotNull())
        .select(
            ivf_cell(v, centroids).alias("cell"),
            F.col(id_col),
            v.alias(vec_col),
            _norm(v).alias("norm"),
        )
        .filter(F.col("norm") > 0.0)
    )


def ivf_topk(
    index: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: scan only the nprobe cells nearest the query (probe
    set computed driver-side from the same centroid literals) and rank by
    exact cosine."""
    import math

    qv = [float(x) for x in query]
    vv = sum(x * x for x in qv)
    dists = []
    for ci, c in enumerate(centroids):
        dot = sum(x * w for x, w in zip(qv, c))
        cc = sum(x * x for x in c)
        dists.append((vv - 2 * dot + cc, ci + 1))
    probes = [cell for _d, cell in sorted(dists)[:nprobe]]

    qn = math.sqrt(vv) or 1.0
    cand = index.filter(F.col("cell").isin(probes))
    cos = _dot_with_lit(F.col(vec_col), qv) / (F.col("norm") * F.lit(qn))
    return (
        cand.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_probe_cells(
    vec: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """Array of the ``nprobe`` cell ids (1-based) nearest to ``vec`` —
    the same squared-distance literals the index uses, ranked by
    (distance asc, cell id asc). Pure column math: the struct sort orders
    by field position, so ties break to the lower cell id in every
    engine (the DuckDB oracle ranks with row_number() over the identical
    distance list)."""
    d = _sq_dists(vec, centroids)
    pairs = F.transform(
        d,
        lambda x, i: F.struct(
            x.alias("d"), (i + F.lit(1)).cast("int").alias("c")
        ),
    )
    return F.transform(
        F.slice(F.array_sort(pairs), 1, nprobe), lambda s: s["c"]
    )


def ivf_topk_batch(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    arrow: bool = True,
) -> DataFrame:
    """Bulk ANN (r3 verdict task 3): kNN for EVERY row of a query table —
    the cross-corpus retrieval shape a training-data pipeline actually
    runs ("find the nearest corpus docs for each eval prompt"), which the
    single-vector ivf_topk cannot express without a driver loop.

    Plan shape, built for 100 TB:
      1. each query row is assigned its nprobe nearest cells JVM-side
         (ivf_probe_cells over the same centroid literals as the index)
         and EXPLODED to one row per probe — queries grow by nprobe, never
         by corpus size;
      2. one equi-join on ``cell`` against the cell-partitioned index —
         when the index table is stored partitioned by cell (ivf_index
         docstring), only the probed cells' partitions are scanned, and
         the shuffle co-partitions both sides on the cell key; a skewed
         cell (dense region of embedding space) splits under AQE skew
         handling rather than serializing on one task;
      3. exact cosine on the joined pairs, then per-query top-k via
         row_number over (cosine desc, id asc) — Spark turns the
         rank-filter into WindowGroupLimit, so each shuffle partition
         keeps k rows per query instead of materializing every candidate.

    Returns (query_id, id, cosine, rank), rank 1..k. Query rows with a
    null or wrong-dimension vector are dropped (same hygiene as
    refine_centroids).

    r8 (guide §4.2/§8): with a double-element index the probe+score side
    runs as a numpy mapInPandas kernel over the index — queries are
    collected driver-side (they are the bounded side by design, the same
    assumption the join's broadcast made), probe cells are computed in
    python with the exact fold/sort the JVM expression used, per-cell
    blocks are scored in the exact fold order, and each batch ships back
    only a margin superset of the rounded top-k per query
    (cosine_scores_pruned reasoning). F.round + the ranking window stay
    in the JVM, so values, tie-breaks and the WindowGroupLimit plan
    shape are unchanged. This removes the 1.3M-pair joined-row
    materialization measured at sf1.0. Other vector types keep the
    legacy equi-join path (``arrow=False`` forces it)."""
    import math

    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, StructField, StructType

    dim = len(centroids[0])
    qv = F.col(vec_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    qfilt = queries.filter(qv.isNotNull() & (F.size(qv) == dim))
    elem_t = None
    try:
        elem_t = index.schema[vec_col].dataType.elementType
    except Exception:
        pass
    if arrow and isinstance(elem_t, DoubleType):
        qrows = qfilt.select(query_id_col, vec_col).collect()
        C = [[float(x) for x in c] for c in centroids]
        cc = [sum(x * x for x in c) for c in C]
        qids = [r[query_id_col] for r in qrows]
        Q = np.array(
            [[float(x) for x in r[vec_col]] for r in qrows], dtype=np.float64
        ).reshape(len(qrows), dim)
        qn = np.empty(len(qrows), dtype=np.float64)
        # per-query probe cells + guarded norm, exact python twins of
        # ivf_probe_cells / _query_norm (left folds, (d, cell) sort)
        by_cell: dict[int, list[int]] = {}
        for j, r in enumerate(qrows):
            q = [float(x) for x in r[vec_col]]
            vv = sum(x * x for x in q)
            n = math.sqrt(vv)
            qn[j] = n if n != 0.0 else 1.0
            dists = []
            for ci, c in enumerate(C):
                dot = sum(x * w_ for x, w_ in zip(q, c))
                dists.append((vv - 2 * dot + cc[ci], ci + 1))
            for _d, cell in sorted(dists)[:nprobe]:
                by_cell.setdefault(cell, []).append(j)

        src = index.select("cell", id_col, vec_col, "norm")
        out_schema = StructType(
            [
                qfilt.schema[query_id_col],
                src.schema[id_col],
                StructField("cosine", DoubleType(), True),
            ]
        )
        margin = 1.1e-6

        def score(batches):
            import pandas as pd

            for pdf in batches:
                if pdf.empty or not qids:
                    continue
                vecs = pdf[vec_col]
                n = len(vecs)
                lens = np.fromiter(
                    (len(x) for x in vecs), dtype=np.int64, count=n
                )
                ok = lens == dim
                cells = pdf["cell"].values
                ids = pdf[id_col].values
                norms = pdf["norm"].values
                # per-query scores across this batch's probed-cell rows
                parts: dict[int, list] = {}
                for cell, qjs in by_cell.items():
                    rows = np.flatnonzero(ok & (cells == cell))
                    if not len(rows):
                        continue
                    X = np.stack(
                        [np.asarray(vecs.iloc[r], dtype=np.float64) for r in rows]
                    )
                    with np.errstate(invalid="ignore", divide="ignore"):
                        block = _fold_dots(X, Q[qjs]) / (
                            norms[rows][:, None] * qn[qjs][None, :]
                        )
                    for col, j in enumerate(qjs):
                        parts.setdefault(j, []).append((rows, block[:, col]))
                out_q, out_i, out_c = [], [], []
                for j, chunks in parts.items():
                    rows = np.concatenate([r for r, _c in chunks])
                    cos = np.concatenate([c for _r, c in chunks])
                    nk = len(cos) - k
                    if nk > 0:
                        thr = np.partition(cos, nk)[nk]
                        with np.errstate(invalid="ignore"):
                            keep = cos >= (thr - margin)
                    else:
                        keep = np.ones(len(cos), dtype=bool)
                    keep |= ~np.isfinite(cos)
                    out_q.extend([qids[j]] * int(keep.sum()))
                    out_i.append(ids[rows[keep]])
                    out_c.append(cos[keep])
                if not out_q:
                    continue
                yield pd.DataFrame(
                    {
                        query_id_col: out_q,
                        id_col: np.concatenate(out_i),
                        "cosine": np.concatenate(out_c),
                    }
                )

        scored = src.mapInPandas(score, out_schema)
        return (
            scored.select(
                F.col(query_id_col),
                F.col(id_col),
                F.round(F.col("cosine"), 6).alias("cosine"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    q = qfilt.select(
        F.col(query_id_col),
        qv.alias("_qv"),
        _query_norm(qv).alias("_qn"),
        F.explode(ivf_probe_cells(qv, centroids, nprobe)).alias("cell"),
    )
    joined = q.join(index, "cell")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = F.round(dot / (F.col("norm") * F.col("_qn")), 6)
    return (
        joined.select(F.col(query_id_col), F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bucketed_topk_batch(
    index: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Bulk ANN over the hyperplane-LSH index (the data-INDEPENDENT twin
    of ivf_topk_batch): every query row is assigned its own bucket (and,
    with ``multiprobe``, all Hamming-1 neighbor buckets) via the same
    plane-weight literals the index used, exploded to one row per probe,
    equi-joined against the bucket-partitioned index, and ranked by
    exact cosine with a per-query WindowGroupLimit top-k.

    Same scale shape as ivf_topk_batch: queries grow by (1 + n_planes)
    probes, never by corpus size; the join shuffle co-partitions on the
    bucket key the stored index is partitioned by. Returns
    (query_id, id, cosine, rank). Matches per-query ``bucketed_topk``
    row-for-row (tests/test_dataops.py)."""
    planes = plane_weights(dim, n_planes)
    qv = F.col(vec_col)
    qb = hyperplane_bucket(qv, planes)
    probes = [qb]
    if multiprobe:
        for i in range(n_planes):
            # flip bit i: prefix [1..i] + flipped char + suffix [i+2..]
            flipped = F.concat(
                F.substring(qb, 1, i),
                F.when(F.substring(qb, i + 1, 1) == "1", "0").otherwise("1"),
                F.substring(qb, i + 2, n_planes - i - 1),
            )
            probes.append(flipped)
    q = queries.filter(qv.isNotNull() & (F.size(qv) == dim)).select(
        F.col(query_id_col),
        qv.alias("_qv"),
        _query_norm(qv).alias("_qn"),
        F.explode(F.array_distinct(F.array(*probes))).alias("bucket"),
    )
    joined = q.join(index, "bucket")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = F.round(dot / (F.col("norm") * F.col("_qn")), 6)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(F.col(query_id_col), F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bucketed_topk(
    index: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: scan only the query's bucket (+ Hamming-1 neighbor
    buckets when multiprobe) and rank by exact cosine."""
    import math

    planes = plane_weights(len(query), n_planes)
    # the query's bucket comes from evaluating the SAME column expression
    # on a 1-row DataFrame — guarantees formula identity with the index
    spark = index.sparkSession
    qdf = spark.createDataFrame([(query,)], f"{vec_col}: array<double>")
    qbucket = qdf.select(
        hyperplane_bucket(F.col(vec_col), planes).alias("b")
    ).first()["b"]
    probes = {qbucket}
    if multiprobe:
        for i in range(n_planes):
            flipped = qbucket[:i] + ("0" if qbucket[i] == "1" else "1") + qbucket[i + 1 :]
            probes.add(flipped)

    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    cand = index.filter(F.col("bucket").isin(*sorted(probes)))
    cos = _dot_with_lit(F.col(vec_col), query) / (F.col("norm") * F.lit(qn))
    return (
        cand.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
