"""Training-data pipeline operators over web-text corpora.

Beyond the reference's retrieval surface (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs: deduplication (exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine), similarity search
(brute-force + IVF ANN), text analysis (language-ID, quality scoring,
token counts, fingerprints), and multimodal binary-column plumbing.

Everything SQL-expressible is built from native Column expressions (stays
in whole-stage codegen, DuckDB-oracled); Python appears only in the
multimodal decode plumbing (Arrow-batched mapInPandas).
"""

from .dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    shingles,
    simhash64,
    simhash_pairs,
)
from .simsearch import (  # noqa: F401
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    rrf_fuse,
    srp_lsh_pairs,
    srp_signature,
)
from .crawl import (  # noqa: F401
    change_rates,
    crawl_schedule,
    robots_filter,
    robots_rules,
)
from .sessions import related_items  # noqa: F401
from .textstats import fingerprints, lang_id, quality_score, token_stats  # noqa: F401
from .websnap import domain_stats, latest_snapshot_per_url  # noqa: F401
