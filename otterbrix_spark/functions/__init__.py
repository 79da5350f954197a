from otterbrix_spark.functions.numeric import dsum, davg, oracle_dsum, oracle_davg
from otterbrix_spark.functions import jsonb, strings

__all__ = ["dsum", "davg", "oracle_dsum", "oracle_davg", "jsonb", "strings"]
