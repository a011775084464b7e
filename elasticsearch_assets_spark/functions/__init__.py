from elasticsearch_assets_spark.functions.analyzer import (  # noqa: F401
    analyze_col,
    analyze_text,
    duckdb_analyze_sql,
)
