from .registry import SchemaRegistry  # noqa: F401
from .types import (  # noqa: F401
    spark_type_for, sqlserver_type_for, struct_from_metadata, filter_metadata,
)
