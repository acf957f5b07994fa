"""Integer-domain power-iteration PCA over an embedding column.

Curation pipelines project embeddings onto their principal component for
whitening, diversity bucketing and outlier cuts; this stage computes the
TOP principal direction of the (exactly centered) embedding cloud and
every vector's projection onto it — with the whole computation specified
in the INTEGER domain so the result is bit-identical at any parallelism
and mirrorable in DuckDB without replaying float sum order (the
``stages/graph.py`` integer-PageRank contract applied to linear algebra).

Spec (the oracle runs the IDENTICAL formula):

* quantize: ``q = floor(v · 2^20 + 0.5)`` per component (the jpeg-oracle
  rounding trick — one exact double multiply + floor, no round()-vs-rint
  half-case divergence).
* exact centered scatter WITHOUT division: with ``A = Σ q qᵀ`` and
  ``S = Σ q`` (integer sums, order-free), ``M = n·A − S·Sᵀ`` equals
  ``n²·Cov`` exactly — centering by the mean without ever dividing.
* power iteration, ``iters`` fixed rounds from ``x₀ = (2^20, …, 2^20)``:
  ``y = M·x`` (exact integer matvec), then renormalize to the 2^20 scale
  with TRUNCATED division ``x' = tdiv(y · 2^20, max(|y|, 1))`` —
  truncation (toward zero) is stated because DuckDB's integer ``//``
  truncates while Python's floors; ``tdiv`` matches DuckDB.
* output: ``pc1_proj = Σᵢ qᵢ·xᵢ`` per vector (int64; |q|·2^20·dim stays
  far below 2^63 for unit-scale embeddings).

Iteration count is part of the spec (like the k-means/GD oracles), not a
convergence claim; components are defined up to sign, and this spec pins
the sign via the deterministic x₀.

Shape at 100 TB: one streaming pass emits per-batch partials — a single
row of dim² + dim + 1 integers, int64-safe for batches ≤ 2^17 rows of
unit-scale vectors — and the driver merges them in PYTHON ints (exact,
unbounded) and runs the dim×dim iteration locally; the final projection
pass broadcasts x (dim ints) and is row-local.  The SQL mirror computes
M in HUGEINT (exact below 2^127, ample at test scale); beyond ~1e9 rows
the driver-side Python-int merge still holds and only the ORACLE's
HUGEINT bound is left behind — quantize coarser or verify on a sample.

The reference engine has no linear-algebra surface; this is part of the
LLM-pipeline surface this engine adds (brief: embedding whitening).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q = 1 << 20


def _tdiv(a: int, b: int) -> int:
    """Truncated integer division (toward zero) — DuckDB's ``//``."""
    s = -1 if (a < 0) != (b < 0) else 1
    return s * (abs(a) // abs(b))


def _partials(batch: pa.Table, vec_col: str):
    emb = batch.column(vec_col)
    lists = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    n = len(lists)
    if n == 0:
        return None
    dim = len(lists[0])
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    v = flat.reshape(n, dim)
    q = np.floor(v * Q + 0.5).astype(np.int64)
    return q, (q.T @ q), q.sum(axis=0), n


def pca_assets(ds, vec_col: str = "embedding", iters: int = 4):
    """Train the component -> (x list[int] at 2^20 scale, dim)."""

    def part(batch: pa.Table) -> pa.Table:
        r = _partials(batch, vec_col)
        if r is None:
            return pa.table(
                {
                    "a": pa.array([], pa.list_(pa.int64())),
                    "s": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        _, A, S, n = r
        return pa.table(
            {
                "a": pa.array([A.ravel().tolist()], pa.list_(pa.int64())),
                "s": pa.array([S.tolist()], pa.list_(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    rows = ds.select_columns([vec_col]).map_batches(
        part, batch_format="pyarrow"
    ).take_all()
    if not rows:
        raise ValueError("empty embedding dataset")
    dim = len(rows[0]["s"])
    # Python-int merge: exact and unbounded regardless of corpus size
    A = [[0] * dim for _ in range(dim)]
    S = [0] * dim
    n = 0
    for r in rows:
        flat = r["a"]
        for i in range(dim):
            Ai = A[i]
            base = i * dim
            for j in range(dim):
                Ai[j] += int(flat[base + j])
        for i in range(dim):
            S[i] += int(r["s"][i])
        n += int(r["n"])
    M = [
        [n * A[i][j] - S[i] * S[j] for j in range(dim)] for i in range(dim)
    ]
    x = [Q] * dim
    for _ in range(iters):
        y = [sum(M[i][j] * x[j] for j in range(dim)) for i in range(dim)]
        m = max(max(abs(c) for c in y), 1)
        x = [_tdiv(c * Q, m) for c in y]
    return x, dim


def pca_project(ds, assets, vec_col: str = "embedding", id_col: str = "vec_id"):
    """-> Dataset(id, pc1_proj) — zero-shuffle broadcast pass."""
    x, dim = assets
    xv = np.asarray(x, dtype=np.int64)
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [pa.field(id_col, id_type), pa.field("pc1_proj", pa.int64())]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        r = _partials(batch, vec_col)
        if r is None:
            return out_schema.empty_table()
        q = r[0]
        return pa.Table.from_arrays(
            [
                batch.column(id_col).combine_chunks(),
                pa.array(q @ xv, pa.int64()),
            ],
            schema=out_schema,
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def embedding_pca(
    ds, vec_col: str = "embedding", id_col: str = "vec_id", iters: int = 4
):
    """Train + project convenience (the driver-query shape)."""
    return pca_project(ds, pca_assets(ds, vec_col, iters), vec_col, id_col)


def embedding_pca_sql(
    iters: int = 4,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror: identical quantization, HUGEINT scatter, unrolled
    truncated-division power iteration."""
    ctes = [
        (
            f"q AS MATERIALIZED (SELECT {id_col}, i.i AS i, "
            f"CAST(floor(CAST({vec_col}[i.i] AS DOUBLE) * {Q} + 0.5) AS HUGEINT) AS qv "
            f"FROM {table} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) i)"
        ),
        "nn AS (SELECT count(*) // " + str(dim) + " AS n FROM q)",
        (
            "a AS MATERIALIZED (SELECT qi.i AS i, qj.i AS j, sum(qi.qv * qj.qv) AS av "
            f"FROM q qi JOIN q qj USING ({id_col}) GROUP BY qi.i, qj.i)"
        ),
        "s AS (SELECT i, sum(qv) AS sv FROM q GROUP BY i)",
        (
            "m AS MATERIALIZED (SELECT a.i, a.j, "
            "(SELECT n FROM nn) * a.av - si.sv * sj.sv AS mv "
            "FROM a JOIN s si ON si.i = a.i JOIN s sj ON sj.i = a.j)"
        ),
        f"x0 AS (SELECT unnest(range(1, {dim + 1})) AS i, CAST({Q} AS HUGEINT) AS xv)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"y{t} AS MATERIALIZED (SELECT m.i, sum(m.mv * x.xv) AS yv "
            f"FROM m JOIN x{t - 1} x ON x.i = m.j GROUP BY m.i)"
        )
        ctes.append(
            f"x{t} AS MATERIALIZED (SELECT i, (yv * {Q}) // "
            f"greatest((SELECT max(abs(yv)) FROM y{t}), 1) AS xv FROM y{t})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q.{id_col}, CAST(sum(q.qv * x.xv) AS BIGINT) AS pc1_proj
FROM q JOIN x{iters} x USING (i)
GROUP BY q.{id_col}
"""
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss signed random projection
# ---------------------------------------------------------------------------

def jl_project(
    ds,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
):
    """Random ±1 projection of embeddings to ``k`` dims (Achlioptas'
    database-friendly Johnson–Lindenstrauss variant) -> Dataset(id,
    proj: list<int64>) — the cheap dimensionality-reduction front-end
    for ANN/clustering when the full vector is too wide to shuffle.

    Determinism contract (mirrored by ``jl_project_sql``): components
    quantize exactly like PCA (``q_i = floor(v_i · 2^20 + 0.5)``), the
    sign matrix is pure hash — ``sign(i,j) = +1 iff the first hex char
    of md5(f"jl{seed}:{i}:{j}") is even`` (0-based i, j) — and
    ``proj_j = Σ_i sign(i,j) · q_i`` is an exact int64 sum (|proj| <=
    dim · 2^20 · max|v|, far inside int64), so the output is
    bit-identical at any parallelism with no trained state anywhere.

    Scale shape: ZERO exchanges — one row-local pass; the sign matrix
    (dim × k ints) is built once per task from the hash, nothing is
    broadcast.  Output is k int64 per row vs dim floats in — the
    projection IS the shuffle-width reduction.
    """
    import hashlib

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    signs = np.empty((dim, k), dtype=np.int64)
    for i in range(dim):
        for j in range(k):
            h = hashlib.md5(f"jl{seed}:{i}:{j}".encode()).hexdigest()
            signs[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1

    def kernel(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(
            batch.column(vec_col).to_pylist(), dtype=np.float64
        )
        if vecs.size == 0:
            vecs = vecs.reshape(0, dim)
        q = np.floor(vecs * Q + 0.5).astype(np.int64)
        y = q @ signs
        n = len(q)
        flat = pa.array(y.reshape(-1), pa.int64())
        offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "proj": pa.ListArray.from_arrays(offsets, flat),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def jl_project_sql(
    k: int = 8,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> str:
    """DuckDB mirror: identical quantization, md5 sign grid, dense
    ordered list."""
    return f"""
WITH q AS MATERIALIZED (
    SELECT {id_col}, i.i AS i,
           CAST(floor(CAST({vec_col}[i.i] AS DOUBLE) * {Q} + 0.5)
                AS BIGINT) AS qv
    FROM {table} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) i
),
sgn AS MATERIALIZED (
    SELECT i.i AS i, j.j AS j,
           CASE WHEN CAST('0x' || substr(
                    md5('jl{seed}:' || (i.i - 1) || ':' || (j.j - 1)),
                    1, 1) AS UBIGINT) % 2 = 0
                THEN 1 ELSE -1 END AS s
    FROM (SELECT unnest(range(1, {dim + 1})) AS i) i
    CROSS JOIN (SELECT unnest(range(1, {k + 1})) AS j) j
),
p AS (
    SELECT q.{id_col}, sgn.j, CAST(SUM(q.qv * sgn.s) AS BIGINT) AS v
    FROM q JOIN sgn ON sgn.i = q.i
    GROUP BY q.{id_col}, sgn.j
)
SELECT {id_col}, list(v ORDER BY j) AS proj FROM p GROUP BY {id_col}
"""
