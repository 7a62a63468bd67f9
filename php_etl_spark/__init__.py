"""php_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine ``azandrew-sidoine/php-etl`` (a config-driven PHP
data-import SDK, see /root/reference/sdk/etl.php): table scans,
projection/mapping specs, predicate parsing, joins (lookup, semi,
anti, fan-out), first-wins dedup, upsert/delete-reinsert sinks and a
JSON pipeline spec compiler — plus the large-scale extensions a
training-data pipeline needs (minhash/simhash dedup, cosine
similarity search, text analysis, streaming windows).

Everything is declared on the DataFrame API so Catalyst performs
predicate pushdown, column pruning and join strategy selection; no
hand-scheduled execution.
"""

__version__ = "0.1.0"

from php_etl_spark.session import get_spark  # noqa: F401
from php_etl_spark.catalog import Catalog  # noqa: F401
