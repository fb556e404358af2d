"""dedup_groups (iterative connected components): exactness against
an independent union-find ground truth over the same candidate
pairs, at two scale factors; plus the log-step pointer-jumping
variant (component_labels_logstep) — fixpoint equality with
union-find on the LSH graph AND on adversarial shapes (a long chain,
where plain propagation needs O(n) rounds and pointer jumping must
land inside an O(log n) round budget)."""

from __future__ import annotations

from chess_pipeline_spark.plans.llm import (
    component_labels_logstep,
    dedup_groups,
    minhash_lsh_candidates,
)


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def test_dedup_groups_match_union_find(spark, sf_dir):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(spark, sf_dir).collect()
    ]
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    expected: dict[int, set[int]] = {}
    for node in uf.parent:
        expected.setdefault(uf.find(node), set()).add(node)

    # members is CSV-serialized at the catalog boundary (driver canon
    # can't hash array cells); parse it back for the set comparison
    got = {
        r["keep_doc_id"]: {int(x) for x in r["members"].split(",")}
        for r in dedup_groups(spark, sf_dir).collect()
    }
    assert len(got) == len(expected)
    for root, members in expected.items():
        assert got[min(members)] == members
    # every group's keep_doc_id is its minimum member
    for keep, members in got.items():
        assert keep == min(members)


def _uf_labels(pairs):
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.parent}


def test_logstep_matches_union_find_on_lsh_graph(spark, sf_dir):
    edges = minhash_lsh_candidates(spark, sf_dir).select("doc_a", "doc_b")
    pairs = [(r.doc_a, r.doc_b) for r in edges.collect()]
    expected = _uf_labels(pairs)
    got = {r.doc_id: r.label for r in component_labels_logstep(edges).collect()}
    assert got == expected


def test_logstep_converges_logarithmically_on_chain(spark):
    # a 200-node path: plain min-propagation needs ~200 rounds (label
    # 0 walks one hop per round); pointer jumping must finish within
    # a dozen — the budget IS the assertion (the function raises on
    # non-convergence)
    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(chain, "doc_a long, doc_b long")
    labels = component_labels_logstep(edges, max_rounds=12).collect()
    assert {r.label for r in labels} == {0}
    assert len(labels) == n


def test_logstep_on_mixed_shapes(spark):
    # cliques + star + chain + isolated edge, shuffled orientations
    edges = []
    for base in (1000, 2000):  # two 6-cliques
        ids = [base + i for i in range(6)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(3000, 3000 + i) for i in range(1, 8)]  # star
    edges += [(4000 + i + 1, 4000 + i) for i in range(30)]  # reversed chain
    edges += [(5000, 5001)]
    expected = _uf_labels(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.label for r in component_labels_logstep(df).collect()}
    assert got == expected


def test_multihop_fixpoint_identical(spark, sf_dir):
    # hops_per_round chains k propagation joins into one materialized
    # round; labels are monotone decreasing and each hop is the same
    # min-fold, so the fixpoint must be byte-identical for any k —
    # including k larger than the graph diameter (over-shooting a
    # converged frame is a no-op)
    from chess_pipeline_spark.plans.llm import component_labels

    base = sorted(
        map(tuple, component_labels(spark, sf_dir, hops_per_round=1).collect())
    )
    for k in (2, 3, 8):
        multi = sorted(
            map(tuple, component_labels(spark, sf_dir, hops_per_round=k).collect())
        )
        assert multi == base, f"hops_per_round={k} diverged"
