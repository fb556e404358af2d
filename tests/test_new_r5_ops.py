"""Ground-truth properties for the three round-5 operators.

- paragraph_dedup: brute-force the chunker + first-occurrence sweep
  in Python over the corpus and compare counts exactly;
- semdedup_embedding: verdicts must be consistent with the
  embedding_near_dup_cosine pair list at the same threshold (a vec is
  a dup iff it appears as the HIGHER id of some pair), and the greedy
  keeper set must contain no within-threshold pair among keepers with
  a lower-id witness — the SemDedup invariant;
- pii_redact_stats: the synthetic corpus has no PII, so detection and
  redaction semantics are pinned here on injected fixture rows
  (catalog-level parity only proves the no-op path).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.corpus import (
    _PARA_WORDS,
    _PII_RULES,
    paragraph_dedup,
    pii_redact_stats,
)
from chess_pipeline_spark.plans.llm import (
    _SEMDEDUP_TAU,
    embedding_near_dup_cosine,
    semdedup_embedding,
)
from chess_pipeline_spark.sources import load_table


def test_paragraph_dedup_matches_bruteforce(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    first: dict[str, tuple[int, int]] = {}
    chunks_of: dict[int, list[str]] = {}
    for doc_id in sorted(docs):
        text = docs[doc_id]
        if text is None:
            chunks_of[doc_id] = []
            continue
        ws = text.split(" ")
        cs = [
            " ".join(ws[i : i + _PARA_WORDS])
            for i in range(0, len(ws), _PARA_WORDS)
        ]
        chunks_of[doc_id] = cs
        for idx, c in enumerate(cs):
            first.setdefault(c, (doc_id, idx))
    expected = {}
    for doc_id, cs in chunks_of.items():
        kept = [
            c for idx, c in enumerate(cs) if first[c] == (doc_id, idx)
        ]
        kept_hash = (
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None
        )
        expected[doc_id] = (len(cs), len(cs) - len(kept), kept_hash)
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.kept_hash)
        for r in paragraph_dedup(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(d for _, d, _ in expected.values()) > 0, "no dup chunks in fixture"


def test_semdedup_consistent_with_pair_list(spark, sf_dir):
    pairs = embedding_near_dup_cosine(spark, sf_dir).collect()
    # embedding_near_dup_cosine's threshold IS the semdedup tau
    dup_ids = {r.vec_b for r in pairs if r.cos_sim >= _SEMDEDUP_TAU}
    best: dict[int, tuple[float, int]] = {}
    for r in pairs:
        if r.cos_sim < _SEMDEDUP_TAU:
            continue
        cand = (r.cos_sim, -r.vec_a)
        if r.vec_b not in best or cand > best[r.vec_b]:
            best[r.vec_b] = cand
    out = semdedup_embedding(spark, sf_dir).collect()
    assert {r.vec_id for r in out if r.is_dup} == dup_ids
    for r in out:
        if r.is_dup:
            cos, neg_id = best[r.vec_id]
            assert (r.dup_cos, r.dup_of) == (cos, -neg_id)
        else:
            assert r.dup_of is None and r.dup_cos is None
    assert dup_ids, "no semantic dups in fixture"
    # every row of the corpus gets a verdict
    assert len(out) == load_table(spark, sf_dir, "embeddings").count()


_PII_FIXTURE = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "ssn 123-45-6789 and phone 415-555-1234 on file"),
    (3, "server at 192.168.0.1 responded; backup 10.0.0.254 did not"),
    (4, "call +1 650.555.0199 maybe"),  # +1 prefix: only 650.555.0199 matches
    (5, "no pii here, just words and 42 numbers"),
    (6, None),
    (7, "double jane@example.com then bob@test.org emails"),
]


def test_pii_detection_and_redaction_semantics(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "pii"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _PII_FIXTURE], pa.int64()),
            "text": pa.array([r[1] for r in _PII_FIXTURE], pa.string()),
            "lang": pa.array(["en"] * len(_PII_FIXTURE), pa.string()),
            "source": pa.array(["s"] * len(_PII_FIXTURE), pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in _PII_FIXTURE], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = {r.doc_id: r for r in pii_redact_stats(spark, str(d)).collect()}

    assert (got[1].n_emails, got[1].changed) == (1, True)
    assert (got[2].n_ssns, got[2].n_phones, got[2].changed) == (1, 1, True)
    assert (got[3].n_ips, got[3].changed) == (2, True)
    assert (got[4].n_phones, got[4].changed) == (1, True)
    assert (
        got[5].n_emails, got[5].n_ssns, got[5].n_phones, got[5].n_ips, got[5].changed,
    ) == (0, 0, 0, 0, False)
    assert got[6].changed is None and got[6].redacted_hash is None
    assert got[7].n_emails == 2

    # redaction chain end-to-end: recompute expected redacted text in
    # Python with the same rules and compare hashes
    import re

    for doc_id, text in _PII_FIXTURE:
        if text is None:
            continue
        red = text
        for pat, repl in _PII_RULES:
            red = re.sub(pat, repl, red)
        assert got[doc_id].redacted_hash == hashlib.md5(red.encode()).hexdigest(), (
            doc_id,
            red,
        )
    # spot-check the placeholders actually landed
    assert "<EMAIL>" in _redact(_PII_FIXTURE[0][1])
    assert "<SSN>" in _redact(_PII_FIXTURE[1][1])
    assert "<IP>" in _redact(_PII_FIXTURE[2][1])


def _redact(text: str) -> str:
    import re

    for pat, repl in _PII_RULES:
        text = re.sub(pat, repl, text)
    return text


def test_paragraph_dedup_conservation(spark, sf_dir):
    # kept + dup == total, and the corpus-wide kept-chunk count equals
    # the number of DISTINCT chunks (each distinct chunk is kept
    # exactly once somewhere)
    rows = paragraph_dedup(spark, sf_dir).collect()
    total = sum(r.n_chunks for r in rows)
    dups = sum(r.n_dup_chunks for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int((size(split(text, ' ')) - 1) / {_PARA_WORDS})), "
                    f"i -> array_join(slice(split(text, ' '), i * {_PARA_WORDS} + 1, {_PARA_WORDS}), ' '))"
                )
            )
        )
        .select("col")
        .distinct()
        .count()
    )
    assert total - dups == n_distinct
    assert 0 < dups < total


def test_paragraph_dedup_boilerplate_skew(spark, tmp_path):
    # the adversarial shape for the digest window: ONE chunk repeated
    # in every document (site boilerplate). All its occurrences land
    # in a single window partition — correctness must hold and every
    # doc except the first must lose exactly that chunk
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chess_pipeline_spark.plans.corpus import _PARA_WORDS

    boiler = " ".join(f"b{i}" for i in range(_PARA_WORDS))
    rows = []
    for d in range(60):
        unique = " ".join(f"u{d}x{i}" for i in range(_PARA_WORDS))
        rows.append((d, boiler + " " + unique))
    rows.append((60, None))  # NULL text: (0, 0, NULL) via the left join
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {r.doc_id: r for r in paragraph_dedup(spark, str(d)).collect()}
    assert got[0].n_dup_chunks == 0 and got[0].n_chunks == 2
    for i in range(1, 60):
        assert (got[i].n_chunks, got[i].n_dup_chunks) == (2, 1), i
    assert (got[60].n_chunks, got[60].n_dup_chunks, got[60].kept_hash) == (0, 0, None)


def test_semdedup_zero_vector_cross_engine(spark, tmp_path):
    # a zero-norm embedding makes cosine 0/0: Spark says NaN (NaN >=
    # tau is false), DuckDB orders NaN above everything (>= tau would
    # be TRUE) — the nullif guard must keep both engines agreeing
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chess_pipeline_spark.plans import catalog
    from tests.oracle_harness import run_and_compare

    rng = [
        [float((i * 7 + j * 3) % 5 - 2) for j in range(64)] for i in range(6)
    ]
    rng[2] = [0.0] * 64  # the zero vector
    rng[4] = list(rng[1])  # an exact dup pair so tau fires
    tbl = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "label": pa.array([1, 1, 1, 2, 1, 2], pa.int64()),
            "embedding": pa.array(rng, pa.list_(pa.float32())),
        }
    )
    d = tmp_path / "zv"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    run_and_compare(
        spark, str(d), "semdedup_embedding", catalog()["semdedup_embedding"]
    )
    out = {
        r.vec_id: r.is_dup
        for r in catalog()["semdedup_embedding"].spark(spark, str(d)).collect()
    }
    assert out[4] is True and out[2] is False


def test_boilerplate_removal_matches_bruteforce(spark, sf_dir):
    # brute-force the RefinedWeb repeated-line rule: chunk every doc,
    # count DISTINCT docs per chunk, drop every occurrence of chunks
    # seen in >= _BOILER_MIN_DOCS docs (including the first — the
    # defining difference from paragraph_dedup's keep-first sweep)
    from chess_pipeline_spark.plans.corpus import (
        _BOILER_MIN_DOCS,
        boilerplate_chunk_removal,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    chunks_of: dict[int, list[str]] = {}
    doc_freq: dict[str, set[int]] = {}
    for doc_id, text in docs.items():
        if text is None:
            chunks_of[doc_id] = []
            continue
        ws = text.split(" ")
        cs = [
            " ".join(ws[i : i + _PARA_WORDS])
            for i in range(0, len(ws), _PARA_WORDS)
        ]
        chunks_of[doc_id] = cs
        for c in cs:
            doc_freq.setdefault(c, set()).add(doc_id)
    boiler = {c for c, d in doc_freq.items() if len(d) >= _BOILER_MIN_DOCS}
    expected = {}
    for doc_id, cs in chunks_of.items():
        kept = [c for c in cs if c not in boiler]
        kept_hash = (
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None
        )
        expected[doc_id] = (len(cs), len(cs) - len(kept), kept_hash)
    got = {
        r.doc_id: (r.n_chunks, r.n_boiler_chunks, r.kept_hash)
        for r in boilerplate_chunk_removal(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(b for _, b, _ in expected.values()) > 0, "no boilerplate in fixture"


def test_boilerplate_differs_from_paragraph_dedup_on_first_copy(spark, sf_dir):
    # a chunk repeated across docs: paragraph_dedup keeps its first
    # occurrence, boilerplate removal drops them all — so boiler
    # counts must strictly exceed dup counts somewhere on this fixture
    from chess_pipeline_spark.plans.corpus import boilerplate_chunk_removal

    dup = {
        r.doc_id: r.n_dup_chunks for r in paragraph_dedup(spark, sf_dir).collect()
    }
    boiler = {
        r.doc_id: r.n_boiler_chunks
        for r in boilerplate_chunk_removal(spark, sf_dir).collect()
    }
    assert all(boiler[d] >= dup[d] for d in dup)
    assert any(boiler[d] > dup[d] for d in dup)


def test_corpus_composition_matches_bruteforce(spark, sf_dir):
    from chess_pipeline_spark.plans.corpus import (
        _COMP_BUCKET_CHARS,
        corpus_composition,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    cells: dict[tuple, list[int]] = {}
    for r in rows:
        key = (r.source, r.lang, r.n_chars // _COMP_BUCKET_CHARS)
        nw = 0 if r.text is None else len(r.text.split(" "))
        c = cells.setdefault(key, [0, 0, 0])
        c[0] += 1
        c[1] += r.n_chars
        c[2] += nw
    total = len(rows)
    got = {
        (r.source, r.lang, r.len_bucket): (
            r.n_docs,
            r.total_chars,
            r.total_words,
            r.doc_share,
        )
        for r in corpus_composition(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    import math

    for key, (nd, nc, nw) in cells.items():
        share = math.floor(nd / total * 1e6 + 0.5) / 1e6
        assert got[key] == (nd, nc, nw, share), key
    # conservation: cells partition the corpus
    assert sum(v[0] for v in got.values()) == total


def test_events_decay_score_matches_bruteforce(spark, sf_dir):
    # integer-exact ground truth in Python: weight 2^(20-k) for
    # k = half-lives since the user's latest event, 0 past 20
    import math

    from chess_pipeline_spark.plans.timeseries import (
        _DECAY_HALF_LIFE_S,
        _DECAY_MAX_K,
        events_decay_score,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts_sec", "value")
        .filter("ts_sec IS NOT NULL")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, evs in by_user.items():
        mx = max(e.ts_sec for e in evs)
        num = 0
        n_recent = 0
        for e in evs:
            k = (mx - e.ts_sec) // _DECAY_HALF_LIFE_S
            if k <= _DECAY_MAX_K:
                n_recent += 1
                cents = math.floor(e.value * 100.0 + 0.5)
                num += cents * (1 << (_DECAY_MAX_K - k))
        score = math.floor(
            num / (100.0 * (1 << _DECAY_MAX_K)) * 1e6 + 0.5
        ) / 1e6
        expected[uid] = (len(evs), n_recent, score)
    got = {
        r.user_id: (r.n_events, r.n_recent, r.decay_score)
        for r in events_decay_score(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in expected.values())


def test_orders_rfm_segments_matches_bruteforce(spark, sf_dir):
    import math

    from chess_pipeline_spark.plans.relational import (
        _RFM_FREQ,
        _RFM_MONETARY_CENTS,
        _RFM_RECENCY_DAYS,
        orders_rfm_segments,
    )

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    per = {}
    ref = max(r.o_orderdate for r in rows)
    for r in rows:
        c = per.setdefault(r.o_custkey, [0, 0, r.o_orderdate])
        c[0] += 1
        c[1] += math.floor(r.o_totalprice * 100.0 + 0.5)
        if r.o_orderdate > c[2]:
            c[2] = r.o_orderdate
    expected = {}
    for cust, (n, cents, last) in per.items():
        rec = (ref - last).days
        r_s = 3 if rec <= _RFM_RECENCY_DAYS[0] else (2 if rec <= _RFM_RECENCY_DAYS[1] else 1)
        f_s = 3 if n >= _RFM_FREQ[0] else (2 if n >= _RFM_FREQ[1] else 1)
        m_s = 3 if cents >= _RFM_MONETARY_CENTS[0] else (
            2 if cents >= _RFM_MONETARY_CENTS[1] else 1
        )
        expected[cust] = (rec, n, cents, r_s, f_s, m_s, f"{r_s}{f_s}{m_s}")
    got = {
        r.o_custkey: (
            r.recency_days,
            r.n_orders,
            r.monetary_cents,
            r.r_score,
            r.f_score,
            r.m_score,
            r.segment,
        )
        for r in orders_rfm_segments(spark, sf_dir).collect()
    }
    assert got == expected
    # fixture sanity: more than one distinct segment, else the CASE
    # chain is untested
    assert len({v[6] for v in expected.values()}) > 1


def test_orders_snapshot_diff_matches_bruteforce(spark, sf_dir):
    import math

    from chess_pipeline_spark.plans.relational import (
        _SNAP_NEW_SINCE,
        _SNAP_OLD_BEFORE,
        orders_snapshot_diff,
    )

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    import datetime

    old_cut = datetime.datetime.fromisoformat(_SNAP_OLD_BEFORE)
    new_cut = datetime.datetime.fromisoformat(_SNAP_NEW_SINCE)
    expected = {}
    for r in rows:
        dt = r.o_orderdate
        old_c = math.floor(r.o_totalprice) * 100 if dt < old_cut else None
        new_c = (
            math.floor(r.o_totalprice * 100.0 + 0.5) if dt >= new_cut else None
        )
        if old_c is None and new_c is None:
            continue
        if old_c is None:
            ct = "insert"
        elif new_c is None:
            ct = "delete"
        elif old_c != new_c:
            ct = "update"
        else:
            ct = "unchanged"
        expected[r.o_orderkey] = (old_c, new_c, ct)
    got = {
        r.o_orderkey: (r.old_cents, r.new_cents, r.change_type)
        for r in orders_snapshot_diff(spark, sf_dir).collect()
    }
    assert got == expected
    kinds = {v[2] for v in expected.values()}
    assert {"insert", "delete", "update"} <= kinds
