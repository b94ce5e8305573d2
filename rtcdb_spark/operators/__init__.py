from rtcdb_spark.operators.relational import asof_join, sessionize, top_k_per_group

__all__ = ["asof_join", "sessionize", "top_k_per_group"]
