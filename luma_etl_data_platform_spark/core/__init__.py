from .session import get_spark, stop_spark  # noqa: F401
