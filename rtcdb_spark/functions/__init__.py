from rtcdb_spark.functions.text import (
    MERSENNE_P,
    stable_hash60,
    shingles,
    tokens,
)

__all__ = ["MERSENNE_P", "stable_hash60", "shingles", "tokens"]
