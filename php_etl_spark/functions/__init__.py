"""Scalar/column function library (SURVEY.md §2.9).

Built-in ``pyspark.sql.functions`` cover nearly everything the
reference computes; this package adds the reference-exact string
helpers (``str_before``/``str_after`` with PHP miss semantics), the
trim-normalized dedup key, and exact decimal aggregation helpers used
to keep aggregate results bit-identical across engines.
"""

from php_etl_spark.functions.strings import (  # noqa: F401
    str_before,
    str_after,
    dedup_key,
    email_valid,
)
from php_etl_spark.functions.exact import (  # noqa: F401
    dsum,
    davg,
    dec,
)
