from elasticsearch_assets_spark.indexing.build import (  # noqa: F401
    IndexTables,
    build_index,
    read_index,
    write_index,
)
