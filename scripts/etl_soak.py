#!/usr/bin/env python3
"""End-to-end corpus-ETL soak at the SCALESOAK regime (r13).

Every soak so far measured catalog queries and streaming ledgers
INDIVIDUALLY; pipeline.run_corpus_etl — the composed production
shape (quality -> PII scrub -> exact dedup -> boilerplate removal ->
paragraph dedup -> stratified sample -> token packing as ONE lazy
plan) — was pytest-verified at fixture scale only. This drives the
full ETL with ALL optional stages on over the 500k-doc replicated
corpus and records:

  laws        run-to-run determinism (count + order-insensitive
              checksum over shards AND audit, twice in one JVM),
              document conservation (survivors + audited == corpus,
              disjoint), stage agreement with the catalog
              quality_filter_verdicts query on the same corpus, and
              the shard start-offset layout invariant
  profile     end-to-end wall per run, output/audit cardinalities,
              plan shape of the composed DAG (shuffle exchange
              count — the docstring's "exactly two keyed exchanges"
              claim, extended by the two optional chunk stages),
              and persistent-pin flatness across runs
  provenance  start/end loadavg + the bench calibration block, and
              the heap it ran at (the DSIR-soak discipline)

Writes ETLSOAK_r{ROUND}.json at the repo root and prints one JSON
line. Corpus default: $SOAK_DIR/sfx (/tmp/etl_soak/sfx), generated
here with the ETL-specific append-one-marker-word replication rule —
see the inline comment for why scale_soak's every-word suffix rule
cannot feed a quality gate.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "scripts"))

import pyspark.sql.functions as F  # noqa: E402

from chess_pipeline_spark.checkpoints import (  # noqa: E402
    persistent_rdd_ids,
    scoped_checkpoints,
)
from chess_pipeline_spark.introspect import plan_metrics  # noqa: E402
from chess_pipeline_spark.pipeline import run_corpus_etl  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402


def checksum(df) -> tuple[int, int]:
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    work = os.environ.get("SOAK_DIR", "/tmp/etl_soak")
    sfx = os.path.join(work, "sfx")
    round_no = int(os.environ.get("SOAK_ROUND", "13"))
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="etl-soak")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "round": round_no,
        "corpus": sfx,
        "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "loadavg_start": list(os.getloadavg()),
        "stages": {
            "scrub_pii": True,
            "drop_boilerplate": True,
            "drop_dup_paragraphs": True,
        },
    }
    from bench import platform_calibration

    out["calibration"] = platform_calibration(spark)

    # The ETL soak needs its OWN replication rule. scale_soak's
    # every-word 'q<rep>' suffix is right for the dedup/ngram soaks
    # (every token must stay replica-distinct) but it destroys
    # stopwords, so the quality gate drops 100% of that corpus and
    # the pipeline's later stages never execute (measured: the first
    # r13 draw audited all 500k docs as stage=quality). Here each
    # replica appends ONE marker word instead — stopword ratio and
    # the chars-per-word band survive, replicas stay distinct for the
    # exact-dedup stage, and only docs at the 90-word ceiling shift a
    # quality verdict.
    if not os.path.exists(os.path.join(sfx, "documents.parquet")):
        base = spark.read.parquet(f"{base_dir}/documents.parquet")
        reps = spark.range(100).withColumnRenamed("id", "__rep")
        os.makedirs(sfx, exist_ok=True)
        (
            base.crossJoin(F.broadcast(reps))
            .withColumn(
                "doc_id", F.col("doc_id") + F.col("__rep") * F.lit(1_000_000_000)
            )
            .withColumn(
                "text",
                F.expr(
                    "concat(text, ' zzq', translate(CAST(__rep AS STRING), "
                    "'0123456789', 'abcdefghij'))"
                ),
            )
            .drop("__rep")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(f"{sfx}/documents.parquet")
        )
    docs = spark.read.parquet(f"{sfx}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n_docs = docs.count()
    out["n_docs"] = n_docs

    def one_run() -> dict:
        t0 = time.perf_counter()
        res = run_corpus_etl(
            docs,
            scrub_pii=True,
            drop_boilerplate=True,
            drop_dup_paragraphs=True,
        )
        shards_ck = checksum(res.shards)
        audit_ck = checksum(res.audit)
        wall = time.perf_counter() - t0
        return {
            "wall_s": round(wall, 3),
            "shards": shards_ck,
            "audit": audit_ck,
            "pins_after": len(persistent_rdd_ids(spark)),
            "_res": res,
        }

    pins_base = len(persistent_rdd_ids(spark))
    runs = []
    for _ in range(2):
        with scoped_checkpoints(spark):
            r = one_run()
        res = r.pop("_res")
        runs.append(r)
    out["runs"] = runs
    laws: dict = {}
    laws["deterministic"] = (
        runs[0]["shards"] == runs[1]["shards"]
        and runs[0]["audit"] == runs[1]["audit"]
    )
    laws["pins_flat"] = (
        runs[0]["pins_after"] == runs[1]["pins_after"] == pins_base
    )

    # laws over the (lazy) final-run frames, one extra evaluation each
    with scoped_checkpoints(spark):
        res = run_corpus_etl(
            docs,
            scrub_pii=True,
            drop_boilerplate=True,
            drop_dup_paragraphs=True,
        )
        surv = res.shards.select("doc_id")
        audited = res.audit.select("doc_id")
        n_surv, n_audit = surv.count(), audited.count()
        laws["conservation"] = {
            "survivors": n_surv,
            "audited": n_audit,
            "total_equals_corpus": (n_surv + n_audit) == n_docs,
            "disjoint": surv.join(audited, "doc_id").count() == 0,
            "audit_unique": n_audit == audited.distinct().count(),
        }
        # stage agreement with the standalone catalog query on the
        # same corpus: the ETL's quality stage must drop exactly the
        # documents quality_filter_verdicts rejects
        from chess_pipeline_spark.plans.corpus import quality_filter_verdicts

        q_cat = (
            quality_filter_verdicts(spark, sfx)
            .filter(~F.col("keep"))
            .select("doc_id")
        )
        q_etl = res.audit.filter(F.col("stage") == "quality").select("doc_id")
        laws["quality_stage_agreement"] = {
            "catalog_drops": q_cat.count(),
            "etl_drops": q_etl.count(),
            "sets_equal": q_cat.exceptAll(q_etl).count() == 0
            and q_etl.exceptAll(q_cat).count() == 0,
        }
        # shard layout law (concat-and-chunk semantics: a document
        # belongs to the shard its FIRST token lands in, and docs
        # span boundaries — so shard token SUMS legitimately exceed
        # the budget; the first r13 draw misread that as 48
        # violations): every doc's start offset cum - n_tokens must
        # lie inside its shard's token range [shard*B, (shard+1)*B)
        bad_layout = (
            res.shards.withColumn(
                "start", F.col("cum_tokens") - F.col("n_tokens")
            )
            .filter(
                (F.col("start") < F.col("shard_id") * 4096)
                | (F.col("start") >= (F.col("shard_id") + 1) * 4096)
            )
            .count()
        )
        laws["shard_layout_violations"] = bad_layout
        out["audit_by_stage"] = {
            r["stage"]: r["n"]
            for r in res.audit.groupBy("stage")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        pm_shards = plan_metrics(res.shards)
        pm_audit = plan_metrics(res.audit)
    out["laws"] = laws
    out["plan"] = {
        "shards_exchanges": pm_shards["exchanges"],
        "shards_scans": pm_shards["scans"],
        "shards_python_eval": pm_shards["python_eval"],
        "audit_exchanges": pm_audit["exchanges"],
    }
    out["loadavg_end"] = list(os.getloadavg())
    ok = (
        laws["deterministic"]
        and laws["pins_flat"]
        and laws["conservation"]["total_equals_corpus"]
        and laws["conservation"]["disjoint"]
        and laws["quality_stage_agreement"]["sets_equal"]
        and laws["shard_layout_violations"] == 0
        # non-vacuity: a corpus that fails wholesale at the first
        # stage "passes" every downstream law without running it (the
        # first r13 draw did exactly that) — require survivors AND
        # real dedup work (the 100x replicas guarantee exact dups)
        and laws["conservation"]["survivors"] > 0
        and out["audit_by_stage"].get("exact_dup", 0) > 0
    )
    out["ok"] = ok
    line = json.dumps(out)
    print(line)
    Path(_REPO, f"ETLSOAK_r{round_no:02d}.json").write_text(line + "\n")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
