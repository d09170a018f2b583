"""Rows-only text ops: MinHash/LSH recall, SimHash + fingerprint determinism."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(a, b) for a, b in zip(df["doc_a"], df["doc_b"])}


def test_minhash_recall_vs_exhaustive(ray_session):
    """LSH candidates (verified with true Jaccard) must recover nearly all
    same-source pairs found by the exhaustive bucketed Jaccard pass.  With
    2 rows/band x 16 bands, detection probability at jac=0.5 is
    1-(1-0.25)^16 ≈ 0.99."""
    from kgray.pipelines.textproc import minhash_lsh_pairs, ngram_jaccard_pairs

    exhaustive = _pairs(ngram_jaccard_pairs(SF_DIR).to_pandas())
    lsh = _pairs(minhash_lsh_pairs(SF_DIR).to_pandas())
    assert exhaustive, "fixture should contain near-dup pairs"
    recall = len(exhaustive & lsh) / len(exhaustive)
    assert recall >= 0.9, f"LSH recall {recall:.3f} too low"
    # every LSH-emitted pair is Jaccard-verified, so none below threshold
    from kgray.pipelines.textproc import JACCARD_THRESHOLD, _token_sets
    import pandas as pd

    lsh_df = minhash_lsh_pairs(SF_DIR).to_pandas()
    assert (lsh_df["jac"] >= JACCARD_THRESHOLD).all()


def test_simhash_deterministic_and_close_for_similar(ray_session):
    from kgray.pipelines.textproc import simhash_signatures

    a = simhash_signatures(SF_DIR).to_pandas().sort_values("doc_id", ignore_index=True)
    b = simhash_signatures(SF_DIR).to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    assert a["simhash"].str.len().eq(16).all()


def test_fingerprints_deterministic(ray_session):
    from kgray.pipelines.textproc import fingerprints

    a = fingerprints(SF_DIR).to_pandas().sort_values("doc_id", ignore_index=True)
    b = fingerprints(SF_DIR).to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    assert len(a) == 500


def test_simhash_hamming_tracks_jaccard():
    """Property: token-identical docs get identical simhash; disjoint docs
    differ.  Pure-kernel test, no Ray."""
    from kgray.pipelines.textproc import _simhash64

    s1 = _simhash64({"alpha", "beta", "gamma", "delta"})
    s2 = _simhash64({"alpha", "beta", "gamma", "delta"})
    s3 = _simhash64({"zeta", "omega", "kappa", "lambda"})
    assert s1 == s2
    assert bin(s1 ^ s3).count("1") > 8


def test_simhash_pairs_bucketed(ray_session):
    """simhash_pairs: exactly-once emission, symmetric-dedup ordering, and
    every exhaustive high-Jaccard pair within the Hamming budget is found
    when its signatures agree in >=1 band (pigeonhole at dist<=3)."""
    import numpy as np

    from kgray.pipelines.textproc import (
        SIMHASH_MAX_HAMMING, _simhash64, _token_sets, simhash_pairs,
    )

    df = simhash_pairs(SF_DIR).to_pandas()
    assert (df["doc_a"] < df["doc_b"]).all()
    assert not df.duplicated(["doc_a", "doc_b"]).any()
    assert (df["hamming"] <= SIMHASH_MAX_HAMMING).all()

    # cross-check a sample of emitted pairs against direct signatures
    import pyarrow.parquet as pq

    docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    sig = {i: _simhash64(t) for i, t in zip(
        docs["doc_id"].to_pylist(), _token_sets(docs["text"].to_pylist()))}
    for r in df.head(50).itertuples():
        assert bin(sig[r.doc_a] ^ sig[r.doc_b]).count("1") == r.hamming


def test_fingerprint_vectorized_matches_scalar_loop():
    """_fp_window_min must be bit-identical to the scalar
    ``acc = (acc*B + h) % M`` rolling loop on random inputs, including
    docs shorter than the window."""
    import numpy as np

    from kgray.pipelines.textproc import _FP_BASE, _FP_MOD, _fp_window_min

    rng = np.random.RandomState(3)
    for n in (1, 2, 3, 4, 5, 7, 50, 500):
        for _ in range(5):
            hashes = rng.randint(0, _FP_MOD, size=n, dtype=np.int64).astype(np.uint64)
            window = 4
            best = None
            hl = [int(x) for x in hashes]
            for i in range(max(1, n - window + 1)):
                acc = 0
                for h in hl[i:i + window]:
                    acc = (acc * _FP_BASE + h) % _FP_MOD
                best = acc if best is None else min(best, acc)
            assert _fp_window_min(hashes, window) == best, (n, best)


def test_jaccard_chunked_path_matches_dense(monkeypatch):
    """The bounded chunked path (oversized buckets) must emit exactly the
    dense incidence-matmul result."""
    import numpy as np

    import kgray.pipelines.textproc as T

    rng = np.random.RandomState(11)
    ids = np.arange(300, dtype=np.int64)
    toks = []
    base = np.unique(rng.randint(0, 5000, size=40).astype(np.uint64))
    for i in range(300):
        if i % 3 == 0:  # near-dup cluster around `base`
            t = base.copy()
            if i % 9 == 0 and len(t) > 2:
                t = t[:-1]
        else:
            t = np.unique(rng.randint(0, 10**6, size=rng.randint(5, 60)).astype(np.uint64))
        toks.append(np.sort(t))
    dense = T._jaccard_pairs_for_group(ids, toks)
    monkeypatch.setattr(T, "_JACCARD_DENSE_MAX", 10)
    monkeypatch.setattr(T, "_JACCARD_CHUNK_ROWS", 64)
    chunked = T._jaccard_pairs_for_group(ids, toks)
    for d, c in zip(dense, chunked):
        assert (np.sort(d) == np.sort(c)).all()
    # same (a,b) pair set
    dset = set(zip(dense[0].tolist(), dense[1].tolist()))
    cset = set(zip(chunked[0].tolist(), chunked[1].tolist()))
    assert dset == cset and len(dset) > 50


def test_jaccard_skewed_bucket_bounded(ray_session):
    """One source holding ~85% of docs (m over the dense cap) must complete
    through the chunked path within bounded memory/time."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import kgray.pipelines.textproc as T

    rng = np.random.RandomState(5)
    n = 6000
    rows = []
    words = [f"w{i}" for i in range(4000)]
    for i in range(n):
        src = "hot" if i < int(n * 0.85) else f"cold{i % 7}"
        k = 5 + (i % 37)
        text = " ".join(words[j] for j in rng.randint(0, 4000, size=k))
        if i % 500 == 0:  # a few exact dup pairs to find
            text = "alpha beta gamma delta epsilon"
        rows.append(dict(doc_id=i, text=text, source=src))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pylist(rows),
                       os.path.join(d, "documents.parquet"))
        got = T.ngram_jaccard_pairs(d).materialize().take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    expected = {(a, b) for a in range(0, n, 500) for b in range(0, n, 500)
                if a < b and (a < n * 0.85) == (b < n * 0.85)
                and (a < n * 0.85 or (a % 7) == (b % 7))}
    assert expected <= pairs


def test_ngram_jaccard_hot_source_splits_into_block_tasks(ray_session, tmp_path, monkeypatch):
    """VERDICT r3 #3: a source holding ~80% of docs must fan out into >1
    scoring task (block pairs), and the split plan must not change the
    emitted pair set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from kgray.pipelines import textproc as tp

    # corpus: 40 docs, 32 in one hot source; several exact-duplicate texts
    rng = np.random.default_rng(11)
    base = ["alpha beta gamma delta epsilon zeta", "one two three four five six"]
    texts, srcs = [], []
    for i in range(40):
        t = base[i % 2] + (" extra" if i % 7 == 0 else "")
        texts.append(t)
        srcs.append("hot" if i < 32 else f"cold{i % 3}")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    baseline = _pairs(tp.ngram_jaccard_pairs(str(d)).to_pandas())
    assert baseline, "fixture must contain duplicate pairs"

    # force the hot group to split into >=4 blocks
    monkeypatch.setattr(tp, "_JACCARD_GROUP_SPLIT", 10)
    monkeypatch.setattr(tp, "_JACCARD_BLOCK_ROWS", 8)
    plan = tp._jaccard_block_plan({"hot": 32, "cold0": 3})
    assert plan["hot"] >= 4 and plan["cold0"] == 1
    split = tp.ngram_jaccard_pairs(str(d)).to_pandas()
    assert _pairs(split) == baseline
    # exactly-once: no duplicate pair rows across block tasks
    assert not split.duplicated(["doc_a", "doc_b"]).any()


def test_ws_class_equals_python_backslash_s():
    """WS_CHARS must be exactly Python re's \\s set (str mode): the Arrow
    RE2 tokenizer, the Python tokenizer, and the DuckDB oracle all split on
    this explicit class (ADVICE r4 #1)."""
    import re

    from kgray.pipelines.textproc import WS_CHARS

    expect = {chr(c) for c in range(0x11000) if re.match(r"\s", chr(c))}
    assert set(WS_CHARS) == expect
    assert len(WS_CHARS) == len(set(WS_CHARS))


def test_fingerprint_unicode_whitespace_matches_oracle():
    """Docs containing NBSP/\\x0b/U+2028 (whitespace Python's \\s matches
    but RE2's \\s does not) must fingerprint identically in the vectorized
    pipeline kernel and the scalar oracle (ADVICE r4 #1)."""
    import pyarrow as pa

    from kgray.expected import _fingerprint_scalar
    from kgray.pipelines.textproc import _fingerprint_col

    docs = [
        "a\xa0b\x0bc d e f g",
        "one two three four five six",
        "\x1ctab\x1dsep\x1eand\x1fmore tokens here now",
        "plain ascii control case",
        "\xa0",  # whitespace-only -> empty fingerprint sentinel
    ]
    got = _fingerprint_col(pa.array(docs, pa.string()), 4).to_pylist()
    want = [_fingerprint_scalar(t) for t in docs]
    assert got == want


def test_batch_token_hashes_matches_scalar():
    """The batched tokenize+hash pass must produce, per doc, exactly the
    sorted-distinct hash array of the scalar reference path (VERDICT r4
    #4: both route through the one vectorized column hash)."""
    import numpy as np

    from kgray.pipelines.textproc import (
        _batch_token_hashes, _token_hashes, _token_sets,
    )

    texts = ["hello world hello", "a\xa0b　c", "", "   \t ", "x y z x"]
    batch = _batch_token_hashes(texts)
    for t, h in zip(texts, batch):
        ref = _token_hashes(_token_sets([t])[0])
        assert np.array_equal(h, ref), t
