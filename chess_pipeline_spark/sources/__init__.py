from chess_pipeline_spark.sources.tables import (  # noqa: F401
    TABLES,
    clear_scan_cache,
    ensure_session_confs,
    load_table,
    load_tables,
    spread,
)
