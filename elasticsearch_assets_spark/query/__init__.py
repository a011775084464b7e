from elasticsearch_assets_spark.query.bm25 import K1, B, idf  # noqa: F401
from elasticsearch_assets_spark.query.exec import (  # noqa: F401
    match_query,
    term_filter_count,
    wildcard_query,
)
