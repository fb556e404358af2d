"""Ship the engine package to executor Python workers.

Any operator backed by a Python UDF (mapInPandas / pandas_udf whose
closure references chess_pipeline_spark modules) needs the package
importable on every executor. On a cluster that's --py-files; in
local/driver-embedded runs the worker processes only inherit the
launcher's environment, so a driver that imported us via a sys.path
edit (as the verification driver does) would crash with
ModuleNotFoundError inside the worker.

``ensure_package_on_executors`` zips the installed package once per
session and registers it with SparkContext.addPyFile — the same
mechanism spark-submit uses — making every UDF entry point
self-contained regardless of how the driver found us.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_MARKER_CONF = "spark.chess_pipeline_spark.pyfiles.shipped"


def ensure_package_on_executors(spark: SparkSession) -> None:
    try:
        if spark.conf.get(_MARKER_CONF, "") == "true":
            return
    except Exception:
        pass
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources: list[tuple[str, str]] = []
    digest = hashlib.sha1()
    for root, _dirs, files in os.walk(pkg_dir):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.join("chess_pipeline_spark", os.path.relpath(full, pkg_dir))
            sources.append((full, rel))
            digest.update(rel.encode())
            with open(full, "rb") as fh:
                digest.update(fh.read())
    # content-hashed name: a changed package never reuses a stale
    # zip (pid reuse, hot redeploys); write-then-rename so a
    # concurrent caller can never addPyFile a half-written archive
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"chess_pipeline_spark-pyfiles-{digest.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zip_path):
        fd, tmp = tempfile.mkstemp(suffix=".zip", dir=tempfile.gettempdir())
        os.close(fd)
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel in sources:
                zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(_MARKER_CONF, "true")
