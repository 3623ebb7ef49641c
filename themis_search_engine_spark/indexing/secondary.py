"""Secondary index artifacts across the mutation lifecycle.

The serving index (postings_comp + friends) has a full mutation story:
delta merges, compaction, deletes, snapshot pinning (indexing/merge.py).
Secondary artifacts built FROM the same corpus — today the persisted
positional index (queryeng/phrase.py); pattern extends to any future
per-corpus sidecar — do not ride those merges automatically, so a delta
merge can leave a phrase index silently missing the new docs: phrase
results would quietly diverge from BM25 results over the same corpus.

Contract (tested in tests/test_secondary.py):

* every persisted secondary artifact carries a ``_secondary_meta.json``
  stamp recording the serving index GENERATION it was built at
  (queryeng.cache.index_generation — md5 of the merge log, the same
  content-addressed key the query cache uses);
* loading through :func:`check_secondary` against the serving index
  either passes (generations match) or raises
  :class:`StaleSecondaryIndexError` LOUDLY, naming both generations and
  the two remedies;
* the remedies: :func:`merge_positional_delta` appends just the delta
  docs' rows (O(delta), generation-prefixed part files — the same
  segment-append pattern as merge_serving_delta) and restamps, or a
  full rebuild via save_positional_index(..., serving_path=...).

Stamped artifacts: the positional index (queryeng/phrase.py), the
vocabulary gram→term table (queryeng/trigram.save_trigram_terms) and
the doc-grain trigram postings (queryeng/grepdocs.save_doc_trigrams) —
each with an O(delta) merge mirroring :func:`merge_positional_delta`.
The trigram artifacts store NO statistics (df / corpus counts), so a
merge that only changes term stats never stales them; deleted docs'
stale gram rows die at the live-corpus verify join. Derived-on-the-fly
use (passing no gram_table) recomputes from current tables per query
and cannot go stale — correct, but a full dictionary/corpus pass per
query at web scale; persist for serving.

Reference parity: the reference has one index generation and no
mutation story at all (SURVEY.md §2.9's dead merge code); this module
exists because ours does.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class StaleSecondaryIndexError(RuntimeError):
    """A persisted secondary artifact was built at a different serving-
    index generation than the one it is being served against."""


_META = "_secondary_meta.json"


def _generation(serving_path: str) -> str:
    from ..queryeng.cache import index_generation

    return index_generation(serving_path)


def stamp_secondary(
    artifact_path: str, serving_path: str, kind: str
) -> dict:
    """Record (atomically) that the artifact at ``artifact_path`` is
    consistent with the serving index at ``serving_path`` AS OF NOW.
    Call after building or delta-merging the artifact."""
    meta = {
        "kind": kind,
        "serving_path": serving_path,
        "index_generation": _generation(serving_path),
    }
    tmp = os.path.join(artifact_path, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(artifact_path, _META))
    return meta


def check_secondary(
    artifact_path: str, serving_path: str, *, allow_unstamped: bool = False
) -> dict:
    """Raise :class:`StaleSecondaryIndexError` unless the artifact's
    stamped generation matches the serving index's CURRENT generation.
    Returns the meta dict on success. ``allow_unstamped``: accept
    artifacts predating the stamp contract (returns {})."""
    p = os.path.join(artifact_path, _META)
    if not os.path.exists(p):
        if allow_unstamped:
            return {}
        raise StaleSecondaryIndexError(
            f"secondary artifact {artifact_path!r} has no {_META} stamp; "
            "rebuild it via its save_*(..., serving_path=...) entry point "
            "(or pass allow_unstamped=True for a pre-contract artifact)"
        )
    with open(p) as fh:
        meta = json.load(fh)
    now = _generation(serving_path)
    if meta.get("index_generation") != now:
        raise StaleSecondaryIndexError(
            f"secondary artifact {artifact_path!r} "
            f"(kind={meta.get('kind')!r}) was built at index generation "
            f"{meta.get('index_generation')} but {serving_path!r} is now "
            f"at {now} — the artifact is missing later merges. Remedies: "
            "merge the same delta into it (e.g. merge_positional_delta) "
            "or rebuild it from the current corpus."
        )
    return meta


def merge_positional_delta(
    spark: SparkSession,
    pos_path: str,
    new_docs: DataFrame,
    *,
    serving_path: str | None = None,
    partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append the DELTA docs' positional rows to the persisted positional
    index at ``pos_path`` — O(delta) work, mirroring merge_serving_delta's
    segment-append: the delta is written to a temp dir with the SAME
    (term-repartitioned, (term, doc_id, pos)-sorted) layout, its part
    files moved in under a unique prefix, and the freshness stamp updated
    to the serving index's post-merge generation.

    Positional rows are per-(doc, term, pos) facts with no global
    statistics, so unlike BM25 postings a delta append is EXACT — no
    avgdl envelope, no fragment accumulation semantics; phrase results
    after the append equal a full rebuild row-for-row (pinned in
    tests/test_secondary.py). ``new_docs`` must be the same delta frame
    given to merge_serving_delta (disjoint doc_ids — the serving build's
    uniqueness precondition).
    """
    import shutil
    import uuid

    from ..queryeng.phrase import positional_index

    tmp = f"{pos_path}.delta-{uuid.uuid4().hex[:8]}"
    (
        positional_index(new_docs, id_col=id_col, text_col=text_col)
        .repartition(partitions, "term")
        .sortWithinPartitions("term", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    prefix = f"delta-{uuid.uuid4().hex[:8]}-"
    try:
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                os.replace(f"{tmp}/{f}", f"{pos_path}/{prefix}{f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if serving_path is not None:
        stamp_secondary(pos_path, serving_path, "positional")
