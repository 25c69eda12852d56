from silkworm_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    canonicalize_udf,
    host_of,
    host_udf,
    merge_params,
    url_hash_col,
    url_join,
    url_join_udf,
)
