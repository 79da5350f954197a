from otterbrix_spark.operators.recursive import recursive_cte

__all__ = ["recursive_cte"]
