from scicat_ingestor_spark.functions.casts import CAST_REGISTRY, cast_to_type
from scicat_ingestor_spark.functions.scalar import OPERATOR_REGISTRY, apply_operator

__all__ = ["CAST_REGISTRY", "cast_to_type", "OPERATOR_REGISTRY", "apply_operator"]
