"""Operator library — the SURVEY.md §2 inventory as thin, idiomatic
DataFrame combinators. Each helper returns a lazy DataFrame/Column so
Catalyst owns the physical plan (pushdown, join strategy, codegen).
"""

from php_etl_spark.operators.project import compile_mapping, apply_mapping  # noqa: F401
from php_etl_spark.operators.filtering import parse_predicate, parse_conjunction  # noqa: F401
from php_etl_spark.operators.joins import (  # noqa: F401
    lookup_join,
    semi_join,
    anti_join,
    fanout_join,
    asof_join,
    range_join,
)
from php_etl_spark.operators.agg import first_wins_dedup  # noqa: F401
from php_etl_spark.operators.windows import top_k_per_group, moving_avg  # noqa: F401
