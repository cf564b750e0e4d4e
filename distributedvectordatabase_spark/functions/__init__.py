from distributedvectordatabase_spark.functions.register import register_sql_functions
from distributedvectordatabase_spark.functions.vector import (
    cosine_dist,
    cosine_sim,
    dot,
    l2,
    l2_norm,
    l2_normalize,
    l2sq,
)

__all__ = [
    "register_sql_functions",
    "cosine_dist",
    "cosine_sim",
    "dot",
    "l2",
    "l2_norm",
    "l2_normalize",
    "l2sq",
]
