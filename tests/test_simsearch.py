"""Similarity search: IVF recall vs brute force; determinism."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for q, grp in df.groupby("query_id"):
        out[q] = set(grp["neighbor_id"])
    return out


def test_ivf_recall_vs_brute(ray_session):
    from kgray.pipelines.simsearch import knn_brute, knn_ivf

    brute = _topk_sets(knn_brute(SF_DIR).to_pandas())
    ivf = _topk_sets(knn_ivf(SF_DIR).to_pandas())
    assert set(brute) == set(ivf)
    recalls = [len(brute[q] & ivf[q]) / len(brute[q]) for q in brute]
    avg = sum(recalls) / len(recalls)
    # uniform-ish random vectors: probing 4/16 clusters still finds a
    # substantial share of true neighbors; the exact bound is data-dependent
    assert avg >= 0.3, f"IVF recall {avg:.2f}"


def test_brute_topk_shape(ray_session):
    from kgray.pipelines.simsearch import N_QUERIES, TOP_K, knn_brute

    df = knn_brute(SF_DIR).to_pandas()
    assert len(df) == N_QUERIES * TOP_K
    assert (df.groupby("query_id").size() == TOP_K).all()
    # no self-matches
    assert (df["query_id"] != df["neighbor_id"]).all()
