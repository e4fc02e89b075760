from .merge import ordered_projection, union_of_schemas  # noqa: F401
from .validate import cast_profile, reconcile_counts  # noqa: F401
