"""Composed corpus ETL (pipeline.run_corpus_etl): the one-plan
quality -> dedup -> sample -> pack flow must agree with the
individually-verified catalog stages, and its audit ledger must
account for every input document exactly once.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.pipeline import run_corpus_etl
from chess_pipeline_spark.plans.corpus import (
    _SAMPLE_PERMILLE,
    quality_filter_verdicts,
    stratified_sample,
)
from chess_pipeline_spark.sources import load_table


def _ids(df, col="doc_id"):
    return sorted(r[0] for r in df.select(col).collect())


def test_every_document_lands_in_exactly_one_ledger(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    survivors = set(_ids(out.shards))
    dropped = set(_ids(out.audit))
    assert survivors.isdisjoint(dropped)
    assert survivors | dropped == set(_ids(docs))
    # audit has one row per dropped doc (no double-dropping)
    assert out.audit.count() == len(dropped)


def test_quality_stage_matches_catalog_verdicts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    audit_quality = set(_ids(out.audit.filter(F.col("stage") == "quality")))
    verdicts = quality_filter_verdicts(spark, sf_dir)
    assert audit_quality == set(_ids(verdicts.filter(~F.col("keep"))))


def test_dedup_keeps_min_id_and_unique_digests(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    survivors = docs.join(out.shards.select("doc_id"), "doc_id").select(
        "doc_id", F.md5("text").alias("fp")
    )
    # survivor digests are unique
    assert survivors.count() == survivors.select("fp").distinct().count()
    # every dup audit row names a surviving-or-smaller doc
    dups = out.audit.filter(F.col("stage") == "exact_dup").select(
        "doc_id", F.split("reason", ":")[1].cast("long").alias("kept")
    )
    assert dups.filter(F.col("kept") >= F.col("doc_id")).count() == 0


def test_sample_stage_matches_catalog_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    # every surviving doc must be in the catalog sample (the catalog
    # query samples BEFORE quality/dedup, so it is a superset)
    catalog_sample = set(_ids(stratified_sample(spark, sf_dir)))
    assert set(_ids(out.shards)) <= catalog_sample
    sampled_out = out.audit.filter(F.col("stage") == "sampled_out")
    bad = sampled_out.filter(
        F.split("reason", ":")[1].cast("long") < _SAMPLE_PERMILLE
    )
    assert bad.count() == 0


def test_packing_is_contiguous_per_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs, shard_tokens=512)
    rows = out.shards.orderBy("source", "doc_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        run = 0
        prev_shard = -1
        for r in rs:
            assert r.cum_tokens == run + r.n_tokens, (source, r)
            assert r.shard_id == run // 512, (source, r)
            assert r.shard_id >= prev_shard  # shards only move forward
            run += r.n_tokens
            prev_shard = r.shard_id


def test_null_text_document_lands_in_audit(spark, sf_dir):
    # a NULL text makes every quality rule NULL; the gate must force
    # such rows into the audit ledger (not silently drop them from
    # both ledgers via the NULL predicate)
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").limit(5)
    nulled = docs.unionByName(
        docs.limit(1).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.lit(None).cast("string").alias("text"),
            "lang",
            "source",
            F.lit(None).cast("long").alias("n_chars"),
        ).select(docs.columns)
    )
    out = run_corpus_etl(nulled)
    survivors = set(_ids(out.shards))
    dropped = set(_ids(out.audit))
    assert survivors | dropped == set(_ids(nulled))
    row = out.audit.filter(F.col("doc_id") >= 100000).collect()
    assert len(row) == 1
    assert row[0]["stage"] == "quality"
    assert "null_text" in row[0]["reason"]


def test_materialize_corpus_is_idempotent(spark, sf_dir, tmp_path):
    from chess_pipeline_spark.pipeline import materialize_corpus

    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    base = str(tmp_path / "corpus")
    materialize_corpus(out, base)
    first = sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/corpus_shards").collect()
    )
    # second run over the same batch must replace, not duplicate
    materialize_corpus(run_corpus_etl(docs), base)
    second = sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/corpus_shards").collect()
    )
    assert first == second and len(first) > 0
    audit = spark.read.parquet(f"{base}/corpus_audit")
    assert audit.count() == audit.select("doc_id").distinct().count()


def test_composed_plan_has_two_keyed_shuffles(spark, sf_dir):
    # the whole 4-stage flow needs exactly two required exchanges:
    # the digest window and the packing window (audit excluded — its
    # branches reuse the same exchanges)
    docs = load_table(spark, sf_dir, "documents")
    out = run_corpus_etl(docs)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        out.shards._jdf.queryExecution(), "formatted"
    )
    required = sum(
        1
        for ln in plan.splitlines()
        if "hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln
    )
    assert required == 2, plan


def _synthetic_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_scrub_pii_stage_redacts_before_packing(spark):
    # 30-word docs pass the quality gate (20-90 words, 3-7 chars/word,
    # stopword ratio >= 0.02); doc ids 2/7/25 hash into the kept
    # sample buckets for source 's', so sampling can't eat the test.
    # Docs 2 and 7 differ ONLY in their email — with the scrub on
    # they must dedup together
    base = " ".join(f"word{i} the nearby stream keeps" for i in range(6))
    rows = [
        (2, "s", base + " contact alice@example.com now"),
        (7, "s", base + " contact bob@other.org now"),
        (25, "s", base + " nothing sensitive here at all"),
    ]
    out = run_corpus_etl(_synthetic_docs(spark, rows), scrub_pii=True)
    audit = {r.doc_id: r.stage for r in out.audit.collect()}
    survivors = set(_ids(out.shards))
    # doc 7 becomes an exact duplicate of doc 2 post-redaction
    assert audit.get(7) == "exact_dup"
    assert survivors == {2, 25}
    # without the scrub both survive as distinct documents
    out2 = run_corpus_etl(_synthetic_docs(spark, rows))
    assert set(_ids(out2.shards)) == {2, 7, 25}


def test_drop_dup_paragraphs_stage(spark):
    # doc 11 and 12 share their full 20-word chunk content; doc 12
    # is NOT an exact dup (different second chunk order? no — make
    # doc 12's every chunk a repeat of doc 11's chunks, but in an
    # order that changes the full-text digest) -> paragraph stage
    # must drop it while exact dedup could not
    c1 = " ".join(f"alpha{i} the stream keeps moving" for i in range(4))
    c2 = " ".join(f"bravo{i} the stream keeps moving" for i in range(4))
    c3 = " ".join(f"carol{i} the stream keeps moving" for i in range(4))
    rows = [
        (2, "s", c1 + " " + c2),
        (7, "s", c2 + " " + c1),  # same chunks, swapped order
        (12, "s", c1 + " " + c3),
    ]
    out = run_corpus_etl(
        _synthetic_docs(spark, rows), drop_dup_paragraphs=True
    )
    audit = {r.doc_id: (r.stage, r.reason) for r in out.audit.collect()}
    assert audit.get(7) == ("paragraph_dup", "all_chunks_seen_earlier")
    survivors = set(_ids(out.shards))
    assert 2 in survivors
    # doc 12 survives with its c1 chunk stripped (first seen in 2):
    # its packed token count reflects only the novel chunk
    toks = {r.doc_id: r.n_tokens for r in out.shards.collect()}
    assert toks[12] < toks[2]


def test_optional_stages_default_off_plan_unchanged(spark, sf_dir):
    # the 2-exchange guarantee of the default path must not regress
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        run_corpus_etl(docs)
        .shards._jdf.queryExecution().executedPlan().toString()
    )
    assert "paragraph_dup" not in plan


def test_drop_boilerplate_stage(spark):
    # c1 appears in all three docs -> it is boilerplate and must be
    # stripped from EVERY host, including doc 2 (which paragraph
    # dedup would have let keep it); c2/c3/c4 are unique per doc.
    # Doc 25 is pure boilerplate and must route to the audit.
    c1 = " ".join(f"alpha{i} the stream keeps moving" for i in range(4))
    c2 = " ".join(f"bravo{i} the stream keeps moving" for i in range(4))
    c3 = " ".join(f"carol{i} the stream keeps moving" for i in range(4))
    rows = [
        (2, "s", c1 + " " + c2),
        (7, "s", c1 + " " + c3),
        (25, "s", c1),
    ]
    out = run_corpus_etl(_synthetic_docs(spark, rows), drop_boilerplate=True)
    audit = {r.doc_id: (r.stage, r.reason) for r in out.audit.collect()}
    assert audit.get(25) == ("boilerplate", "all_chunks_corpus_frequent")
    toks = {r.doc_id: r.n_tokens for r in out.shards.collect()}
    assert set(toks) == {2, 7}
    # both survivors were cut to their single novel chunk
    assert toks[2] == toks[7]
    # cross-check: with the stage off, doc 2 keeps c1 too and packs
    # more tokens
    base = {
        r.doc_id: r.n_tokens
        for r in run_corpus_etl(_synthetic_docs(spark, rows)).shards.collect()
    }
    assert base[2] > toks[2]


def test_boilerplate_stage_agrees_with_catalog_query(spark, sf_dir):
    # the catalog query runs over ALL documents while the stage runs
    # over quality/dedup survivors, so exact agreement isn't defined;
    # pin the stage's marginal semantics instead: enabling it never
    # adds a survivor and never increases a survivor's token count
    docs = load_table(spark, sf_dir, "documents")
    base = {
        r.doc_id: r.n_tokens for r in run_corpus_etl(docs).shards.collect()
    }
    with_b = {
        r.doc_id: r.n_tokens
        for r in run_corpus_etl(docs, drop_boilerplate=True).shards.collect()
    }
    assert set(with_b) <= set(base)
    assert all(with_b[d] <= base[d] for d in with_b)
