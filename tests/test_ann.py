"""ANN correctness: the IVF (nprobe=1) result must be the EXACT
top-k restricted to the probed inverted list — verified against an
independent numpy ground truth (not the engine, not DuckDB).

Note: the synthetic embeddings are uniform — labels carry no cluster
structure — so nprobe=1 *recall vs the global top-k* is chance-level
by construction. The correctness property of IVF given a coarse
quantizer is exactness within the probed list, which is what we
assert."""

from __future__ import annotations

import math

import numpy as np

from chess_pipeline_spark.plans.llm import knn_cosine_ivf, knn_cosine_topk
from chess_pipeline_spark.sources import load_table


def _fround(x: float, n: int = 6) -> float:
    return math.floor(x * 10**n + 0.5) / 10**n


def _load(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, labels, X


def _numpy_ivf(ids, labels, X, k=5, n_queries=5):
    out = {}
    uniq = sorted(set(labels.tolist()))
    cent = {l: X[labels == l].mean(axis=0) for l in uniq}
    for qid in range(n_queries):
        qi = int(np.where(ids == qid)[0][0])
        q = X[qi]
        qn = np.linalg.norm(q)
        # nearest centroid on cosine rounded at 1e-9, label tiebreak
        best = max(
            uniq,
            key=lambda l: (
                _fround(float(q @ cent[l]) / (qn * np.linalg.norm(cent[l])), 9),
                -l,
            ),
        )
        mask = (labels == best) & (ids != qid)
        cand_ids = ids[mask]
        cos = X[mask] @ q / (np.linalg.norm(X[mask], axis=1) * qn)
        scored = sorted(
            zip(cand_ids.tolist(), [_fround(float(c)) for c in cos]),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        out[qid] = {(nid, c) for nid, c in scored}
    return out


def test_ivf_matches_numpy_ground_truth(spark, sf_dir):
    ids, labels, X = _load(spark, sf_dir)
    truth = _numpy_ivf(ids, labels, X)
    got: dict[int, set] = {}
    for r in knn_cosine_ivf(spark, sf_dir).collect():
        got.setdefault(r["qid"], set()).add((r["neighbor_id"], r["cos_sim"]))
    assert set(got) == set(truth)
    for qid in truth:
        assert got[qid] == truth[qid], f"query {qid}: {got[qid]} != {truth[qid]}"


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    ids, labels, X = _load(spark, sf_dir)
    got: dict[int, set] = {}
    for r in knn_cosine_topk(spark, sf_dir).collect():
        got.setdefault(r["qid"], set()).add((r["neighbor_id"], r["cos_sim"]))
    for qid in range(5):
        qi = int(np.where(ids == qid)[0][0])
        q = X[qi]
        mask = ids != qid
        cos = X[mask] @ q / (np.linalg.norm(X[mask], axis=1) * np.linalg.norm(q))
        scored = sorted(
            zip(ids[mask].tolist(), [_fround(float(c)) for c in cos]),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert got[qid] == set(scored), f"query {qid} mismatch"


def test_ivf_neighbors_all_from_one_list(spark, sf_dir):
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    per_q: dict[int, set[int]] = {}
    for r in knn_cosine_ivf(spark, sf_dir).collect():
        per_q.setdefault(r["qid"], set()).add(labels[r["neighbor_id"]])
    for qid, ls in per_q.items():
        assert len(ls) == 1, f"query {qid} probed multiple lists: {ls}"
