from scicat_ingestor_spark.plans.schema_model import (
    MetadataSchema,
    SchemaField,
    VariableDef,
)
from scicat_ingestor_spark.plans.compiler import compile_schema

__all__ = ["MetadataSchema", "SchemaField", "VariableDef", "compile_schema"]
