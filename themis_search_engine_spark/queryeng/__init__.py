from .bm25 import bm25_score_all, bm25_topk  # noqa: F401
from .boolquery import boolean_score_all, parse_boolean  # noqa: F401
from .cache import cached_query_topk, index_generation  # noqa: F401
from .explain import explain_scores, search_after, total_hits  # noqa: F401
from .fielded import fielded_topk, parse_fielded  # noqa: F401
from .federated import (  # noqa: F401
    federated_topk,
    federated_wand_topk,
    merged_global_stats,
    select_shards,
    selective_topk,
    selective_wand_topk,
)
from .topical import (  # noqa: F401
    doc_tf_vectors,
    topical_shard_map,
    vector_shard_map,
)
from .evalmetrics import paired_randomization_test, rbp_err  # noqa: F401
from .mlt import significant_terms  # noqa: F401
from .qpp import query_difficulty, route_by_difficulty  # noqa: F401
from .tiered import (  # noqa: F401
    champion_lists,
    tiered_topk,
    tiered_topk_with_fallback,
)
from .grepdocs import grep_docs, grep_snippets, regex_grep  # noqa: F401
from .ql import ql_score_all  # noqa: F401
from .regexsearch import plan_regex, regex_qterms  # noqa: F401
from .sdm import sdm_score_all  # noqa: F401
from .spell import compound_split_qterms, fuzzy_qterms  # noqa: F401
from .planner import choose_query_plan, search_serving  # noqa: F401
from .pipeline import (  # noqa: F401
    parse_queries,
    qterms_df,
    query_term_list,
    query_term_map,
)
from .prf import prf_qterms, prf_topk  # noqa: F401
from .sqlapi import bm25_topk_sql, register_index_views  # noqa: F401
from .trigram import infix_qterms  # noqa: F401
