from php_etl_spark.sources.readers import read_source  # noqa: F401
from php_etl_spark.sources.writers import (  # noqa: F401
    append,
    overwrite,
    upsert,
    delete_reinsert,
    split_quarantine,
)
