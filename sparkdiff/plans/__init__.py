from sparkdiff.plans.dialect import to_spark_sql  # noqa: F401
from sparkdiff.plans.macro import MacroExpander  # noqa: F401
