#!/usr/bin/env python3
"""Attribute ivf_build's absolute cost at soak scale (r11 verdict
task 6: 91.9 s at 500k vectors — the largest absolute in the repo).

Splits the build into its phases and times each one end-to-end (noop
sink or real write, matching what the phase does in build_ivf_index):

  assign      _nearest_lists over the 8 coarse centroids (row-local
              broadcast fold, no shuffle)
  int8+norm   the affine code + norm projection (row-local)
  pq_encode   the 8x32 product-quantization argmin (row-local; the
              suspected dominator: 256 subspace-distance folds/row)
  write       the partitionBy(list_id) shuffle + parquet encode of
              the full payload
  full_build  build_ivf_index end-to-end (the bench phase)

Reads the SCALESOAK corpus (SOAK_DIR/sfx, default /tmp/scale_soak)
so the numbers line up with SCALESOAK_r{N}.json's ivf_build row.
Prints one JSON line; the decision goes to SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from chess_pipeline_spark.ann_index import (  # noqa: E402
    _NORM,
    _encode_rows,
    _nearest_lists,
    build_ivf_index,
)
from chess_pipeline_spark.checkpoints import scoped_checkpoints  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    soak = os.environ.get("SOAK_DIR", "/tmp/scale_soak")
    corpus_path = f"{soak}/sfx/embeddings.parquet"
    out: dict = {"corpus": corpus_path, "loadavg_start": list(os.getloadavg())}

    spark = get_spark(app_name="ivf-build-profile")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    out["n_vectors"] = corpus.count()

    n_lists, id_col = 8, "vec_id"
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("long")
            .alias("list_id"),
            F.col("embedding").alias("centroid"),
        )
        .withColumn("c_nrm", F.expr(_NORM.format(v="centroid")))
        .localCheckpoint()
    )
    vecs = corpus.select(id_col, "embedding")
    dim = corpus.select(F.size("embedding").alias("d")).first()["d"]
    codebook = (
        corpus.orderBy(id_col)
        .limit(32)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cid"),
            F.col("embedding").alias("c"),
        )
        .localCheckpoint()
    )

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    assigned = _nearest_lists(vecs, seeds, 1, id_col)
    out["assign_s"] = timed(lambda: noop(assigned))
    out["int8_norm_s"] = timed(
        lambda: noop(
            assigned.withColumn("nrm", F.expr(_NORM.format(v="embedding")))
            .withColumn("q_mn", F.expr("CAST(array_min(embedding) AS DOUBLE)"))
            .withColumn(
                "code",
                F.expr(
                    "transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE)"
                    " - q_mn) / 1.0 + 0.5) - 128 AS TINYINT))"
                ),
            )
        )
    )
    full_payload = _encode_rows(assigned, codebook, dim // 8, id_col)
    out["pq_encode_s"] = timed(lambda: noop(full_payload))
    tmp = "/tmp/ivf_profile_write"
    shutil.rmtree(tmp, ignore_errors=True)
    out["write_s"] = timed(
        lambda: full_payload.write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(f"{tmp}/lists"),
        runs=1,
    )
    idx = "/tmp/ivf_profile_index"
    shutil.rmtree(idx, ignore_errors=True)

    def full() -> None:
        with scoped_checkpoints(spark):
            build_ivf_index(corpus, idx, n_lists=n_lists, id_col=id_col)

    out["full_build_s"] = timed(full, runs=1)
    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())
