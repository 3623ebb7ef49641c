from .bm25 import bm25_score_all, bm25_topk  # noqa: F401
from .planner import choose_query_plan, search_serving  # noqa: F401
from .pipeline import (  # noqa: F401
    parse_queries,
    qterms_df,
    query_term_list,
    query_term_map,
)
