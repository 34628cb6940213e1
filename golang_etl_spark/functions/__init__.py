from golang_etl_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    normalize,
)

__all__ = ["cosine_similarity", "dot", "l2_norm", "normalize"]
