"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``  : exact cosine top-k, pure relational formulation
  (posexplode -> join -> sum-of-products -> window top-k). Every step is a
  built-in expression; DuckDB can reproduce it exactly (the correctness
  oracle), and Catalyst turns it into one shuffle + partial aggregation.
- ``brute_force_topk_gemm`` : same result via numpy GEMM inside
  ``mapInPandas`` against a broadcast query matrix — the throughput path
  (vectorized, no join blow-up); used when the query set fits in memory.
- ``lsh_topk``          : random-hyperplane LSH bucketing (sign bits from
  deterministic per-plane hash projections) -> candidate join inside
  buckets -> exact re-rank. The 100 TB path: probes only matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType
from pyspark.sql.window import Window


def _norm_col(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))


def cosine_col(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)
    return dot / (_norm_col(a) * _norm_col(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact, relational, oracle-able.

    Deterministic total order: (-cosine_rounded, neighbor_id) so ranks are
    reproducible across engines and float summation orders."""
    from .util import rebalance

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    e = rebalance(embeddings).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev"))
    scored = (
        q.crossJoin(e)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("ev")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_gemm(
    embeddings: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Throughput variant: broadcast query matrix, one GEMM per Arrow batch,
    per-partition top-k then global top-k (tree-reduced by the final window
    over only ~k*partitions rows, not n rows)."""
    spark = embeddings.sparkSession
    qids = [q[0] for q in query_vecs]
    qm = np.array([q[1] for q in query_vecs], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qm))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def fn(batches):
        qids_l, qm_l = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            em = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
            em = em / np.maximum(np.linalg.norm(em, axis=1, keepdims=True), 1e-12)
            cos = qm_l @ em.T  # (q, n)
            out_q, out_n, out_c = [], [], []
            kk = min(k + 1, cos.shape[1])
            for qi, qid in enumerate(qids_l):
                idx = np.argpartition(-cos[qi], kk - 1)[:kk]
                for j in idx:
                    if ids[j] != qid:
                        out_q.append(qid)
                        out_n.append(ids[j])
                        out_c.append(round(float(cos[qi, j]), round_digits))
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    from .util import rebalance

    partial = rebalance(embeddings).mapInPandas(fn, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplane_weights(planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 weight matrix (planes x dim) — no RNG state,
    reproducible everywhere."""
    w = np.empty((planes, dim), dtype=np.float64)
    for p in range(planes):
        for d in range(dim):
            h = (p * 1315423911 + d * 2654435761) % 2147483647
            w[p, d] = 1.0 if (h >> 7) % 2 == 0 else -1.0
    return w


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_broadcast_rows: int = 200_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Blocked GEMM: the (ids, row-normalized matrix) is broadcast once and each
    Arrow batch computes its block against it — one pass over the table, no
    O(n^2) join materialization (only surviving pairs are emitted). This is
    the exact/verification path; it requires the full matrix to fit on
    executors (guarded by ``max_broadcast_rows``). The corpus-scale path is
    ``lsh_topk``-style hyperplane bucketing with this function applied per
    bucket."""
    spark = embeddings.sparkSession
    # bound check BEFORE any driver materialization: a limit(max+1).count()
    # ships one bigint, so an over-sized corpus is refused without the
    # driver ever holding rows (the guard must fire before the damage)
    probe = embeddings.limit(max_broadcast_rows + 1).count()
    if probe > max_broadcast_rows:
        raise ValueError(
            f"over {max_broadcast_rows} rows exceed "
            f"max_broadcast_rows={max_broadcast_rows}; "
            "use hyperplane-bucketed blocking for corpus-scale near-dup"
        )
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((ids, m))

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def fn(batches):
        all_ids, all_m = bc.value
        pos = {int(i): k for k, i in enumerate(all_ids)}
        for pdf in batches:
            blk_ids = pdf[id_col].to_numpy()
            blk = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
            blk = blk / np.maximum(np.linalg.norm(blk, axis=1, keepdims=True), 1e-12)
            cos = blk @ all_m.T  # (block, n)
            rounded = np.round(cos, round_digits)
            out_a, out_b, out_c = [], [], []
            for bi, aid in enumerate(blk_ids):
                hits = np.where(rounded[bi] >= threshold)[0]
                for j in hits:
                    other = int(all_ids[j])
                    if int(aid) < other:
                        out_a.append(int(aid))
                        out_b.append(other)
                        out_c.append(float(rounded[bi, j]))
            yield pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    from .util import rebalance

    return rebalance(embeddings).mapInPandas(fn, schema=schema)


def embedding_cosine_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    num_blocks: int | None = None,
    rows_per_block: int = 8192,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (a < b, cosine >= threshold)
    — fully distributed, no driver collect, no full-matrix broadcast.

    Classic blocked all-pairs: rows hash into B blocks; each row is shipped
    to the B block-pair groups it participates in; one ``applyInPandas``
    GEMM per (p, q) block pair emits only the surviving pairs. Shuffle
    volume is B x data (the inherent cost of exact all-pairs), spread over
    B*(B+1)/2 independent tasks — wall clock scales with executors instead
    of a single driver. ``embedding_cosine_pairs`` (broadcast GEMM) stays
    the fast path when the matrix fits per-executor; this is the exact path
    beyond that. Output is identical to the broadcast path by construction."""
    import math

    spark = embeddings.sparkSession
    if num_blocks is None:
        n = embeddings.count()
        num_blocks = max(1, math.ceil(n / rows_per_block))
    B = num_blocks

    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk"),
    )
    # replicate each row into every block pair it belongs to
    rep = e.select(
        "vid", "vec", "blk", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("other")
    ).select(
        "vid",
        "vec",
        "blk",
        # distinct `other` values yield distinct sorted (p, q) pairs, so each
        # row reaches each of its B block-pair groups exactly once — no dedup
        # shuffle needed before the groupBy
        F.least("blk", "other").alias("p"),
        F.greatest("blk", "other").alias("q"),
    )

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def per_pair(key, pdf):
        p, q = key
        ids = pdf["vid"].to_numpy()
        blks = pdf["blk"].to_numpy()
        m = np.stack(pdf["vec"].map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        if p == q:
            li = np.arange(len(ids))
            ri = li
        else:
            li = np.where(blks == p)[0]
            ri = np.where(blks == q)[0]
        if len(li) == 0 or len(ri) == 0:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        cos = np.round(m[li] @ m[ri].T, round_digits)
        ai, bi = np.where(cos >= threshold)
        la, rb = ids[li][ai], ids[ri][bi]
        if p == q:
            # the full intra-block matrix holds both (i,j) and (j,i): keep
            # the a < b orientation once (also drops the self-diagonal)
            keep = la < rb
            la, rb, cv = la[keep], rb[keep], cos[ai, bi][keep]
        else:
            # each cross-block pair appears exactly once — ORIENT it (a
            # filter here would silently drop pairs whose p-side id is
            # the larger one)
            keep = la != rb
            cv = cos[ai, bi][keep]
            la, rb = la[keep], rb[keep]
            la, rb = np.minimum(la, rb), np.maximum(la, rb)
        return pd.DataFrame({"a": la, "b": rb, "cosine": cv})

    return rep.groupBy("p", "q").applyInPandas(per_pair, schema=schema)


def embedding_cosine_pairs_bucketed(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    planes: int = 12,
    dim: int = 64,
    probe_bits: int = 1,
) -> DataFrame:
    """APPROXIMATE corpus-scale near-duplicate pairs: hyperplane-LSH bucket
    blocking + exact cosine verify inside buckets (the 100 TB path — work is
    proportional to bucket sizes, never all-pairs).

    Recall is the probability that a >= threshold pair collides in some
    probed bucket: per plane P[same sign] = 1 - theta/pi, boosted by
    multi-probing every <= ``probe_bits``-bit-flip neighbor bucket.
    Precision is exact (candidates are verified with true cosine).
    tests/test_dedup_recall.py quantifies recall vs the exact paths."""
    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", hyperplane_bucket_col(F.col("vec"), planes, dim))
    probes = [F.col("bucket")]
    if probe_bits >= 1:
        probes += [F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)]
    if probe_bits >= 2:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << p) | (1 << r)))
            for p in range(planes)
            for r in range(p + 1, planes)
        ]
    # probing only one side of the pair covers a bucket distance of
    # probe_bits between the two rows' buckets
    probed = e.select("vid", "vec", F.explode(F.array(*probes)).alias("bucket"))
    pairs = (
        probed.alias("x")
        .join(e.alias("y"), ["bucket"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(
            F.col("x.vid").alias("a"),
            F.col("y.vid").alias("b"),
            F.round(cosine_col(F.col("x.vec"), F.col("y.vec")), round_digits).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
    return pairs


def hyperplane_bucket_col(vec_col, planes: int = 12, dim: int = 64):
    """Deterministic random-hyperplane signature (int column), computed as
    one numpy GEMM per Arrow batch: bucket = packed sign bits of W @ v.

    A pure-expression formulation needs a planes*dim-term expression tree
    (640 nodes) that blows past codegen limits and evaluates interpreted,
    per element — the batched GEMM is ~100x faster and identical in output."""
    from pyspark.sql.functions import pandas_udf

    w = _hyperplane_weights(planes, dim)
    powers = (1 << np.arange(planes, dtype=np.int64))

    @pandas_udf("int")
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.zeros((len(vecs), dim), dtype=np.float64)
        for i, v in enumerate(vecs):
            if v is not None:
                a = np.asarray(v, dtype=np.float64)
                m[i, : min(dim, a.shape[0])] = a[:dim]
        proj = m @ w.T  # (n, planes)
        return pd.Series(((proj > 0) @ powers).astype(np.int32))

    return _bucket(vec_col)


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (the IVF training
    step): init = the ``n_centroids`` lowest-id vectors (reproducible, no
    RNG), then Lloyd iterations computed DISTRIBUTED — each Arrow batch
    GEMMs against the broadcast centroid matrix and emits per-centroid
    partial sums (n_centroids x dim rows per partition, independent of
    corpus size); the driver only ever reduces the tiny partial-sum table.
    Returns the (n_centroids, dim) row-normalized centroid matrix."""
    spark = embeddings.sparkSession
    seed_rows = (
        embeddings.orderBy(id_col).limit(n_centroids).select(vec_col).collect()
    )
    c = np.stack([np.asarray(r[0], dtype=np.float64) for r in seed_rows])
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    dim = c.shape[1]

    schema = StructType(
        [
            StructField("cid", LongType()),
            StructField("n", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
        ]
    )
    from .util import rebalance

    data = rebalance(embeddings).select(vec_col).persist()
    data.count()
    try:
        for _ in range(iterations):
            bc = spark.sparkContext.broadcast(c)

            def partial(batches):
                cm = bc.value
                acc_n = np.zeros(cm.shape[0], dtype=np.int64)
                acc_v = np.zeros_like(cm)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    m = np.stack(
                        pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_list()
                    )
                    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                    assign = np.argmax(mn @ cm.T, axis=1)
                    for cid in np.unique(assign):
                        sel = assign == cid
                        acc_n[cid] += int(sel.sum())
                        acc_v[cid] += mn[sel].sum(axis=0)
                yield pd.DataFrame(
                    {
                        "cid": np.arange(cm.shape[0], dtype=np.int64),
                        "n": acc_n,
                        "vsum": [row.tolist() for row in acc_v],
                    }
                )

            partials = data.mapInPandas(partial, schema=schema).collect()
            n = np.zeros(c.shape[0], dtype=np.int64)
            v = np.zeros((c.shape[0], dim))
            for r in partials:
                n[r["cid"]] += r["n"]
                v[r["cid"]] += np.asarray(r["vsum"])
            nz = n > 0
            c = c.copy()
            c[nz] = v[nz] / n[nz, None]
            c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    finally:
        data.unpersist()
    return c


def ivf_assign_col(vec_col, centroids: np.ndarray):
    """Nearest-centroid id (int column) via one GEMM per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    cm = centroids

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mn @ cm.T, axis=1).astype(np.int32))

    return _assign(vec_col)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    nprobe: int = 8,
    round_digits: int = 6,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    cells, probe each query's ``nprobe`` nearest cells, exact-rerank the
    candidates (cosine + deterministic window). The 100 TB path: work per
    query is proportional to the probed cells' population (~nprobe/n_centroids
    of the corpus), the centroid table is tiny and broadcast, and cell
    assignment is one scan. Recall envelope vs brute force is pinned in
    tests/test_dedup_recall.py."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    from .util import rebalance

    e = rebalance(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")
    ).withColumn("cell", ivf_assign_col(F.col("ev"), centroids))

    cm = centroids
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ cm.T
        top = np.argsort(-sims, axis=1)[:, : min(nprobe, cm.shape[0])]
        return pd.Series([row.astype(np.int64).tolist() for row in top])

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("cell", F.explode(_probes(F.col("qv"))))

    cand = q.join(e, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("ev")), round_digits).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 10,
    dim: int = 64,
    round_digits: int = 6,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket (multi-probe:
    exact bucket + all buckets within hamming distance ``probe_radius`` of
    it), exact cosine re-rank inside candidates.

    ``probe_radius`` generalizes the probe set: radius 1 (default) probes
    the query bucket plus its 1-bit flips; radius == ``planes`` probes ALL
    2^planes buckets, which makes the candidate set the whole corpus and
    the search EXACT — under that regime the brute-force cosine SQL is a
    true value oracle for the entire bucket/probe/dedup/re-rank plumbing
    (the same exactness trick as ``ivf_topk`` with nprobe == n_centroids).
    The XOR-mask set is enumerated driver-side — it is pure plane metadata
    (sum of C(planes, i) masks, independent of corpus size)."""
    from itertools import combinations

    from .util import rebalance

    e = rebalance(embeddings).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")).withColumn(
        "bucket", hyperplane_bucket_col(F.col("ev"), planes, dim)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "qbucket", hyperplane_bucket_col(F.col("qv"), planes, dim)
    )
    radius = min(probe_radius, planes)
    masks = [0] + [
        sum(1 << b for b in bits)
        for r in range(1, radius + 1)
        for bits in combinations(range(planes), r)
    ]
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array_distinct(
                F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks])
            )
        ).alias("bucket"),
    )
    cand = probes.join(e, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("ev")), round_digits).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication — cluster the
    embedding space, then prune within-cluster near-duplicates. Returns
    every row as (id_col, cluster, kept); kept=false iff some LOWER-id row
    in the same cluster has cosine >= threshold (greedy lowest-id-wins,
    the deterministic stand-in for the paper's keep-one-per-group rule).

    Deterministic, oracle-replicable formulation: centers are the
    n_clusters lowest-id vectors and assignment is ONE nearest-center pass
    (the k-means init step; swap in ivf_train_centroids for Lloyd-refined
    centers when exact replay isn't required). Assignment = broadcast
    crossJoin against the k-row center table + a map-side-combining
    min(struct(-cos, j)) per row — cosine rounded before the argmax so two
    engines agree, center index as the tie-break. The within-cluster
    verify join is the same bounded shape as the LSH-bucket verify:
    work ∝ Σ cluster², never corpus all-pairs — SemDeDup's own scaling
    argument is that n_clusters grows with the corpus so clusters stay
    bounded. No driver state beyond the k collected seed vectors.
    """
    spark = embeddings.sparkSession
    seed_rows = (
        embeddings.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    )
    seeds_df = spark.createDataFrame(
        [(j, [float(x) for x in r[0]]) for j, r in enumerate(seed_rows)],
        "j int, seed array<double>",
    )
    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    scored = e.crossJoin(F.broadcast(seeds_df)).select(
        "vid",
        "vec",
        F.struct(
            (-F.round(cosine_col(F.col("vec"), F.col("seed")), round_digits)).alias("nc"),
            F.col("j"),
        ).alias("key"),
    )
    assigned = (
        scored.groupBy("vid")
        .agg(F.min("key")["j"].alias("cluster"), F.first("vec").alias("vec"))
        .persist()
    )
    # within-cluster prune as ONE grouped GEMM per cluster (numpy, Arrow
    # batch) instead of an n²-pair zip_with join — same 6-digit-rounded
    # cosine the oracle computes, ~10x less CPU at the same work bound
    vid_type = dict(assigned.dtypes)["vid"]
    drop_schema = f"vid {vid_type}"

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = mn.shape[0]
        dup = np.zeros(n, dtype=bool)
        # row-blocked GEMM (block x n, never n x n): j dropped iff some
        # i<j has rounded cos >= threshold
        blk = 2048
        for a in range(1, n, blk):
            b = min(a + blk, n)
            sims = np.round(mn[a:b] @ mn[:b].T, round_digits)
            cols = np.arange(b)
            rows = np.arange(a, b)
            mask = cols[None, :] < rows[:, None]
            dup[a:b] = ((sims >= threshold) & mask).any(axis=1)
        return pdf.loc[dup, ["vid"]]

    dropped = (
        assigned.groupBy("cluster")
        .applyInPandas(lambda _, pdf: _prune(pdf), drop_schema)
        .withColumn("_dup", F.lit(True))
    )
    return assigned.join(dropped, "vid", "left").select(
        F.col("vid").alias(id_col),
        "cluster",
        F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
    )


def centroid_outliers(
    emb: DataFrame,
    top_n: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding outlier detection for data curation: distance to the
    corpus centroid, top_n farthest vectors (vec_id tie-break). Flags
    mis-embedded / off-distribution documents before they poison dedup or
    ANN structures.

    Relational formulation (posexplode + per-dim avg + join + per-vector
    agg) so the oracle shares it exactly: the per-dim mean is ROUNDED
    before distances (cross-engine sum-order bridge, same regime as
    q_emb_centroids), distances rounded again before the top-n order.
    Shuffles: one d-keyed agg (64 groups — tiny), one broadcast join of
    the 64-row mean table back onto the exploded corpus, one id-keyed
    agg; top-n via TakeOrderedAndProject, never a global sort. At 10^9
    vectors everything is one scan + map-side-combined aggs."""
    d = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("_i", "_x")
    ).withColumn("_x", F.col("_x").cast("double"))
    means = d.groupBy("_i").agg(F.round(F.avg("_x"), round_digits).alias("_m"))
    dist = (
        d.join(F.broadcast(means), "_i")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("_x") - F.col("_m")) * (F.col("_x") - F.col("_m")))),
                round_digits,
            ).alias("dist")
        )
    )
    return dist.orderBy(F.desc("dist"), id_col).limit(top_n)


def embedding_diversity(
    embeddings: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding diversity WITHOUT a pair join: the expected
    squared distance between two random draws satisfies
    E||x-y||^2 = 2(E||x||^2 - ||E x||^2), so corpus diversity — the
    SemDeDup-era health metric for "did my dedup collapse the
    distribution?" — reduces to one scan: mean squared norm + the
    centroid's squared norm. The naive all-pairs estimate is O(n²·d);
    this is O(n·d) and exact (over iid draws with replacement).

    Output per group: (group, n, mean_sq_norm, centroid_sq_norm,
    avg_sq_dist), doubles rounded to 6.

    Scale shape: squared norms fold inside codegen (F.aggregate over the
    array — no Python); the centroid is the posexplode + (group, dim)
    keyed sum idiom (d rows per input row, combinable), then a d-row
    reduce per group. Nothing is ever pairwise.

    PARTITION-INVARIANT (the covariance idiom): values quantize to exact
    fixed-point ints (floor(x·2^20 + 0.5), exact IEEE ops), per-row and
    per-dim sums accumulate exactly in long/decimal(38,0), and only the
    two final fixed expressions msq = Σq²/(n·2^40) and cnorm =
    Σs²/(n·2^20)² touch floats — the 6-dp hash cannot flip with
    summation order.
    """
    S = F.lit(1048576.0)  # 2^20
    S2 = F.lit(1099511627776.0)  # 2^40
    qarr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * S + F.lit(0.5)).cast("long"),
    )
    row_sq = F.aggregate(
        qarr, F.lit(0).cast("long"), lambda acc, q: acc + q * q
    )
    base = embeddings.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        qarr.alias("qv"),
        row_sq.alias("sq"),
    )
    stats = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("sq").cast("decimal(38,0)")).alias("ssq"),
    )
    dims = (
        base.select("grp", F.posexplode(F.col("qv")).alias("dim", "q"))
        .groupBy("grp", "dim")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("s"))
    )
    cent = dims.groupBy("grp").agg(
        F.sum(F.col("s") * F.col("s")).alias("s2")
    )
    n_d = F.col("n").cast("double")
    msq = F.col("ssq").cast("double") / (n_d * S2)
    cnorm = F.col("s2").cast("double") / ((n_d * S) * (n_d * S))
    return (
        stats.join(cent, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.round(msq, 6).alias("mean_sq_norm"),
            F.round(cnorm, 6).alias("centroid_sq_norm"),
            F.round(2 * (msq - cnorm), 6).alias("avg_sq_dist"),
        )
    )


def bow_cosine_join(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
    max_df: int | None = 200,
    round_digits: int = 6,
) -> DataFrame:
    """Sparse bag-of-words cosine similarity join: every document pair
    whose term-frequency vectors' cosine meets ``threshold``, as
    (a, b, cosine) with a < b — the WEIGHTED sibling of the set-overlap
    joins (MinHash/SimHash/Jaccard/containment in dedup.py): repeated
    terms count, so boilerplate-heavy near-dups that Jaccard underweights
    still score high.

    Exactness regime: dot products and squared norms are EXACT bigint
    sums over integer term frequencies, so ``cosine = dot /
    sqrt(na2 * nb2)`` hits one IEEE division + one correctly-rounded
    sqrt — bit-identical across engines, which is what lets the DuckDB
    oracle replay it value-for-value (same trick as the clustering
    coefficient's integer-ratio doubles). Terms with document frequency
    above ``max_df`` are dropped BEFORE norms are computed (cosine in the
    pruned space — the standard stopword-pruning semantic, replayed
    identically by the oracle).

    Scale shape: the inverted-index self-join is the classic DAAT
    formulation — postings ⋈ postings on term is the ONLY corpus-pair
    producer, and its fan-out is bounded by ``max_df``² per term (the
    df cap is the blocking: without it one stopword's postings list
    produces |corpus|² candidate rows; with it the hottest term costs
    max_df² — at web scale pair this with a minhash prefilter for
    recall-bounded candidates). The (a, b) dot-product aggregation is
    map-side combinable; the two norm joins are doc-keyed sort-merge
    joins on tables the size of the corpus, not its square.
    """
    from .search import build_postings

    p = build_postings(docs, id_col=id_col, text_col=text_col, min_len=min_len)
    if max_df is not None:
        hot = (
            p.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("term")
        )
        p = p.join(F.broadcast(hot), "term", "left_anti")
    norms = p.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    dots = (
        p.alias("x")
        .join(
            p.alias("y"),
            (F.col("x.term") == F.col("y.term"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.sum(F.col("x.tf") * F.col("y.tf")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt((F.col("na2") * F.col("nb2")).cast("double")),
        round_digits,
    )
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select("a", "b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
