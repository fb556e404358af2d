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
    zip_path = os.path.join(
        tempfile.gettempdir(), f"chess_pipeline_spark-pyfiles-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "chess_pipeline_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(_MARKER_CONF, "true")
