from . import warehouse  # noqa: F401
