"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force cosine top-k. One scan, one
  ``orderBy(...).limit(k)`` (Spark executes this as a per-partition
  TakeOrdered + driver merge — no full sort, no shuffle of the data).
  The correctness baseline.
* :func:`lsh_topk` — random-hyperplane LSH variant: the scan is
  restricted to buckets within a Hamming radius of the query's bucket,
  cutting the scanned fraction to ~C(n_planes, ≤r)/2^n_planes. The
  scale path for 100 TB embedding tables (bucket column can be a
  partition/cluster key so pruning happens at the file level).
* IVF-style variant: :func:`ivf_assign`/:func:`ivf_topk` — coarse
  k-means-ish centroids (deterministic sampled seeds), probe the
  closest ``n_probe`` lists.

All distance math is JVM-side higher-order functions; the only Python
is driver-side plane/centroid generation (seeded numpy).

Dimension contract: vectors are assumed to share the query/plane
dimension. ``zip_with`` pads a shorter side with NULLs, so a
mismatched-dim vector yields NULL dot/cosine/signature and is ranked
last or bucket-filtered out rather than erroring — validate dimensions
upstream (``embedding_dims`` in the suite does exactly that) if mixed
dims are possible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _dot_lit(vec: Column, plane: np.ndarray) -> Column:
    """Dot product of a vector column with a constant plane via
    zip_with + aggregate over an array literal. (Unrolled per-element
    sums look tempting but blow whole-stage codegen past its 64 KB
    method limit at dim≥64 × many planes; the HOF form stays compact.)"""
    arr = F.array(*[F.lit(float(w)) for w in plane])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def hyperplane_signature(
    vec: Column, *, dim: int, n_planes: int = 12, seed: int = 42
) -> Column:
    """int bucket id: bit b = sign(vec · plane_b). Planes are seeded
    standard normals generated on the driver (tiny literals in the plan)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    sig = F.lit(0)
    for b in range(n_planes):
        bit = (_dot_lit(vec, planes[b]) >= 0).cast("int")
        sig = sig + bit * F.lit(1 << b)
    return sig


def cosine_to_query(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of a vector column against a constant query —
    unrolled dot + norms, pure Catalyst."""
    q = np.asarray(query, dtype=float)
    qn = float(np.linalg.norm(q)) or 1e-12
    dot = _dot_lit(vec, q)
    vn = F.sqrt(
        F.aggregate(
            vec, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return dot / (F.greatest(vn, F.lit(1e-12)) * F.lit(qn))


def _topk(
    df: DataFrame, query: list[float], k: int, vec_col: str, id_col: str
) -> DataFrame:
    """Shared ranking tail for every top-k path: (id, cosine), highest
    first, deterministic id tiebreak. One copy on purpose — the
    approximate paths must rank EXACTLY like the brute-force baseline
    (the driver-hash oracles depend on the tiebreak), so the contract
    lives in one place."""
    return (
        df.select(
            F.col(id_col),
            cosine_to_query(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine: (id, cosine), highest first."""
    return _topk(df, query, k, vec_col, id_col)


def _hamming_ball(center: int, n_planes: int, radius: int) -> list[int]:
    if not 0 <= radius <= 2:
        raise ValueError(
            f"probe_radius must be 0, 1 or 2 (got {radius}) — only the "
            "radius-<=2 ball is enumerated; a silent cap would deliver "
            "lower recall than requested"
        )
    out = [center]
    if radius >= 1:
        for b in range(n_planes):
            out.append(center ^ (1 << b))
    if radius >= 2:
        for b1 in range(n_planes):
            for b2 in range(b1 + 1, n_planes):
                out.append(center ^ (1 << b1) ^ (1 << b2))
    return out


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only vectors whose hyperplane bucket is
    within ``probe_radius`` bits of the query's bucket."""
    q = np.asarray(query, dtype=float)
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, len(q))
    qsig = 0
    for b in range(n_planes):
        if float(planes[b] @ q) >= 0:
            qsig |= 1 << b
    buckets = _hamming_ball(qsig, n_planes, probe_radius)
    sig = hyperplane_signature(
        F.col(vec_col), dim=len(q), n_planes=n_planes, seed=seed
    )
    return _topk(df.where(sig.isin(buckets)), query, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------

def train_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Tiny driver-side Lloyd iterations over a deterministic sample —
    the coarse quantizer for IVF. Sample size is fixed, so driver memory
    is O(sample·dim) regardless of table size."""
    rows = (
        df.select(vec_col)
        # deterministic pseudo-random sample: TakeOrdered on a direct
        # hash of the vector column (one cheap hash per row — no
        # to_json serialization, no full sort/shuffle)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_centroids: input has no vectors to train on"
        )
    x = np.asarray([r[0] for r in rows], dtype=float)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


def ivf_assign(
    vec: Column, centroids: np.ndarray
) -> Column:
    """Nearest-centroid id (L2), NULL for a NULL vector — argmin as
    array_min over (dist, idx) structs so every distance HOF tree
    appears in the plan exactly ONCE (the earlier when-chain form
    re-embedded `least(all dists)` in every branch: ~n²/2 fold
    evaluations per row, the CSE-across-HOF-lambdas trap from
    CLAUDE.md; struct array_min compares dist first, index second, so
    equal-distance ties go to the smallest index exactly as before).
    A one-centroid quantizer degenerates to a single struct (the old
    F.least(*one_arg) raised at analysis)."""
    if len(centroids) == 0:
        raise ValueError("ivf_assign: centroids must be non-empty")
    dist_exprs = []
    for c in centroids:
        arr = F.array(*[F.lit(float(w)) for w in c])
        dist_exprs.append(F.aggregate(
            F.zip_with(
                vec, arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ))
    pairs = F.array(*[
        F.struct(d.alias("d"), F.lit(i).alias("i"))
        for i, d in enumerate(dist_exprs)
    ])
    # NULL vec -> every dist NULL; the when-guard keeps the assign NULL
    # (isin() then drops the row) instead of argmin-ing garbage — the
    # old chain fell through every NULL comparison to the LAST centroid.
    # r5 ADVICE: a NULL-ELEMENT or dim-MISMATCHED vector also NULLs
    # every distance (zip_with pads with NULLs), and a NULL `d` sorts
    # FIRST in the struct array_min — the row silently landed in
    # centroid 0. Distances are all-NULL-or-none (every centroid has the
    # same dim), so probing distance 0 decides validity for all of them
    # at the cost of one extra fold; consulting the winner's own `d`
    # would reference the array_min tree twice (the CSE-across-HOF trap).
    return F.when(
        vec.isNotNull() & dist_exprs[0].isNotNull(),
        F.array_min(pairs)["i"],
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 4,
) -> DataFrame:
    """Probe the ``n_probe`` closest centroid lists, brute-force within."""
    q = np.asarray(query, dtype=float)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probe = [int(i) for i in order[:n_probe]]
    assign = ivf_assign(F.col(vec_col), centroids)
    return _topk(df.where(assign.isin(probe)), query, k, vec_col, id_col)
