from php_etl_spark.plans.spec import PipelineSpec, TableSpec  # noqa: F401
from php_etl_spark.plans.runner import run_pipeline, run_table  # noqa: F401
