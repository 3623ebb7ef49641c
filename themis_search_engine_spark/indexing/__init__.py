from .build import (  # noqa: F401
    InvertedIndex,
    ServingIndex,
    build_index,
    build_and_save,
    build_and_save_serving,
    load_index,
    load_serving_index,
)
from .merge import (  # noqa: F401
    compact_serving_index,
    merge_serving_delta,
    serving_bound_scales,
)
