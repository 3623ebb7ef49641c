from .build import (  # noqa: F401
    InvertedIndex,
    ServingIndex,
    build_index,
    build_and_save,
    build_and_save_serving,
    load_index,
    load_serving_index,
)
