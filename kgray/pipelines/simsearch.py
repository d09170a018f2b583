"""Similarity search over the ``embeddings`` table (``list<float>`` column).

* ``knn_brute``   — exact cosine top-k: the query matrix is broadcast once
                    (``ray.put``), every batch computes a vectorized
                    (batch × query) matmul and emits only its LOCAL top-k
                    per query; the global phase reduces ≤ k·num_batches rows
                    per query.  No full-pairwise materialization. (SQL oracle)
* ``knn_ivf``     — IVF-style ANN: k-means centroids trained on a driver-side
                    sample, broadcast; batches prune to the ``nprobe``
                    nearest clusters before scoring.  Approximate — checked
                    by recall-vs-brute in tests, not SQL.
* ``neardup_cosine`` — embedding near-dup pairs (sim ≥ τ) via the same
                    broadcast-matmul shape.                     (SQL oracle)
* ``label_stats`` — per-label count + mean L2 norm.             (SQL oracle)

At 100 TB the broadcast side stays small (queries / centroids); the corpus
side streams.  ``neardup_cosine`` broadcasts the full matrix and is the
test-scale baseline; its scale path is the LSH-bucketed variant (bucket on
IVF cluster id, pairwise inside buckets — same shape as
textproc.minhash_lsh_pairs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

N_QUERIES = 5
TOP_K = 10
NEARDUP_SIM = 0.4
IVF_CLUSTERS = 16
IVF_NPROBE = 4
_TRAIN_SAMPLE = 256


def _read(sf_dir: str):
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _batch_matrix(b: pa.Table) -> np.ndarray:
    return np.array(b["embedding"].to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Query matrix: the vec_id < N_QUERIES rows (small, driver-side)."""
    t = (
        _read(sf_dir)
        .filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = t["vec_id"].to_numpy()
    qm = np.array(list(t["embedding"]), dtype=np.float64)
    return qids, qm


def _topk_schema() -> pa.Schema:
    return pa.schema(
        [("query_id", pa.int64()), ("neighbor_id", pa.int64()),
         ("sim", pa.float64()), ("sim_raw", pa.float64())]
    )


def _local_topk_fn(q_ref, k: int):
    """Batch scorer: sims for all queries at once, emit local top-k/query."""

    def fn(b: pa.Table) -> pa.Table:
        qids, qn = ray.get(q_ref)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(b))
        sims = m @ qn.T  # (batch, queries)
        out = {n: [] for n in ("query_id", "neighbor_id", "sim", "sim_raw")}
        for j, qid in enumerate(qids):
            col = sims[:, j]
            mask = ids != qid  # exclude self
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            take = cand[np.argsort(-col[cand], kind="stable")][:k]
            for i in take:
                out["query_id"].append(int(qid))
                out["neighbor_id"].append(int(ids[i]))
                out["sim"].append(round(float(col[i]), 4))
                out["sim_raw"].append(float(col[i]))
        return pa.Table.from_pydict(out, schema=_topk_schema())

    return fn


def _global_topk(ds, k: int):
    def reduce_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([("sim_raw", "descending"), ("neighbor_id", "ascending")])
        return g.slice(0, k).drop_columns(["sim_raw"])

    return ds.groupby("query_id").map_groups(reduce_group, batch_format="pyarrow")


def knn_brute(sf_dir: str):
    """Exact cosine top-K for the first N_QUERIES vectors."""
    qids, qm = _load_queries(sf_dir)
    q_ref = ray.put((qids, _normalize(qm)))
    local = _read(sf_dir).map_batches(
        _local_topk_fn(q_ref, TOP_K), batch_format="pyarrow"
    )
    return _global_topk(local, TOP_K)


# ---------------------------------------------------------------------------
# IVF: sample -> k-means (deterministic Lloyd) -> broadcast centroids ->
# cluster-pruned scoring
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations seeded with the first k sample rows."""
    cent = _normalize(sample[:k].copy())
    xn = _normalize(sample)
    for _ in range(iters):
        assign = (xn @ cent.T).argmax(axis=1)
        for c in range(k):
            members = xn[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(sf_dir: str):
    """ANN top-K: score only vectors in the nprobe clusters nearest to each
    query.  Same output schema as knn_brute; recall asserted in tests."""
    qids, qm = _load_queries(sf_dir)
    qn = _normalize(qm)
    sample = np.array(
        list(_read(sf_dir).limit(_TRAIN_SAMPLE).to_pandas()["embedding"]),
        dtype=np.float64,
    )
    cent = train_centroids(sample, IVF_CLUSTERS)
    probe = {
        int(qid): set(np.argsort(-(cent @ qn[j]))[:IVF_NPROBE].tolist())
        for j, qid in enumerate(qids)
    }
    q_ref = ray.put((qids, qn))
    cent_ref = ray.put((cent, probe))
    base_local = _local_topk_fn(q_ref, TOP_K)

    def fn(b: pa.Table) -> pa.Table:
        centroids, probe_map = ray.get(cent_ref)
        m = _normalize(_batch_matrix(b))
        clusters = (m @ centroids.T).argmax(axis=1)
        tables = []
        for j, qid in enumerate(sorted(probe_map)):
            mask = np.isin(clusters, list(probe_map[qid]))
            sub = b.filter(pa.array(mask.tolist(), pa.bool_()))
            if len(sub):
                t = base_local(sub)
                tables.append(t.filter(pa.array(
                    [q == qid for q in t["query_id"].to_pylist()], pa.bool_())))
        if not tables:
            return _topk_schema().empty_table()
        return pa.concat_tables(tables)

    local = _read(sf_dir).map_batches(fn, batch_format="pyarrow")
    return _global_topk(local, TOP_K)


# ---------------------------------------------------------------------------
# embedding near-dup + per-label stats
# ---------------------------------------------------------------------------

def neardup_cosine(sf_dir: str):
    """All pairs with cosine ≥ NEARDUP_SIM.  Broadcast-matrix baseline: each
    batch scores against the full normalized matrix and keeps (i < j) pairs.
    Scale path = cluster-bucketed variant (see module docstring)."""
    full = _read(sf_dir).to_pandas().sort_values("vec_id")
    ids_all = full["vec_id"].to_numpy()
    mat = _normalize(np.array(list(full["embedding"]), dtype=np.float64))
    ref = ray.put((ids_all, mat))

    def fn(b: pa.Table) -> pa.Table:
        aid_all, m_all = ray.get(ref)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(b))
        sims = m @ m_all.T
        rows_a, rows_b, vals = [], [], []
        for r in range(len(ids)):
            hits = np.flatnonzero(sims[r] >= NEARDUP_SIM)
            for c in hits:
                if ids[r] < aid_all[c]:
                    rows_a.append(int(ids[r]))
                    rows_b.append(int(aid_all[c]))
                    vals.append(round(float(sims[r, c]), 4))
        return pa.Table.from_pydict(
            {"vec_a": pa.array(rows_a, pa.int64()), "vec_b": pa.array(rows_b, pa.int64()),
             "sim": pa.array(vals, pa.float64())}
        )

    return _read(sf_dir).map_batches(fn, batch_format="pyarrow")


def label_stats(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def norms(b: pa.Table) -> pa.Table:
        m = _batch_matrix(b)
        return pa.Table.from_pydict(
            {
                "label": pc.cast(b["label"], pa.int64()),
                "norm": pa.array(np.linalg.norm(m, axis=1), pa.float64()),
            }
        )

    out = (
        ds.map_batches(norms, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n"), Mean("norm", alias_name="avg_norm"))
    )

    def round4(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("avg_norm"), "avg_norm", pc.round(b["avg_norm"], 4)
        )

    return out.map_batches(round4, batch_format="pyarrow")
