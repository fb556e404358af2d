"""dedup_groups (iterative connected components): exactness against
an independent union-find ground truth over the same candidate
pairs, at two scale factors."""

from __future__ import annotations

from chess_pipeline_spark.plans.llm import dedup_groups, minhash_lsh_candidates


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
