"""E1-E4: IR evaluation metrics — Average Precision and nDCG.

Reference semantics (themisEval.java:94-153 AP, :217-273 nDCG; SURVEY.md
§2.7): both metrics walk the ranked answer list but count POSITIONS only
at judged documents (unjudged answers are invisible to the metric — the
TREC judged-only convention the reference implements):

  AP   = (Σ_{judged relevant hit i} found_i / counter_i) / found_total
         counter_i = #judged docs seen up to i, found_i = #relevant seen
  DCG  = Σ_{judged relevant hit i} 1 / log2(counter_i + 1)
  IDCG = Σ_{j < R} 1 / log2(j + 2),  R = #relevant among the query's
         judged docs (themisEval.java:247-253)
  nDCG = DCG / IDCG

Spark shape: ranked ⋈ judgments (inner = judged-only), then two running
windows (counter, found) per qid ordered by rank — no UDF. Queries with no
judged doc in the ranked list produce NaN in the reference (0/0); here they
are simply absent from the output (the driver-side aggregate skips NaN the
same way, themisEval.java:280-317).

The synthetic judgment set is a deterministic arithmetic rule over doc_id
and qid (SQL-expressible, so the whole metric pipeline is DuckDB-oracled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def synthetic_judgments(docs: DataFrame, queryset: dict[int, str]) -> DataFrame:
    """(qid, doc_id, relevance) — deterministic pseudo-judgments over the
    corpus doc_ids: every 7th doc (phase-shifted by qid) is judged;
    relevance alternates by a qid-dependent parity. Mirrors the oracle's
    judgments CTE exactly (oracle_sql_ops.sql_eval_ap_ndcg)."""
    spark: SparkSession = docs.sparkSession
    qids = spark.createDataFrame([(q,) for q in queryset], "qid int")
    return (
        docs.select("doc_id")
        .crossJoin(qids)
        .where(F.col("doc_id") % 7 == F.col("qid") % 7)
        .select(
            "qid",
            "doc_id",
            F.when(
                (F.floor(F.col("doc_id") / 7) + F.col("qid")) % 2 == 0, 1
            ).otherwise(0).alias("relevance"),
        )
    )


def ap_ndcg(ranked: DataFrame, judgments: DataFrame) -> DataFrame:
    """(qid, ap, ndcg) from a ranked result (qid, doc_id, rank) and a
    judgment table (qid, doc_id, relevance)."""
    j = ranked.select("qid", "doc_id", "rank").join(
        judgments, ["qid", "doc_id"]
    )
    w = Window.partitionBy("qid").orderBy("rank")
    walked = j.select(
        "qid", "rank", "relevance",
        F.count(F.lit(1)).over(w).alias("counter"),
        F.sum("relevance").over(w).alias("found"),
    )
    per_q = walked.groupBy("qid").agg(
        F.sum(
            F.when(F.col("relevance") == 1,
                   F.col("found") / F.col("counter")).otherwise(0.0)
        ).alias("ap_num"),
        F.max("found").alias("found_total"),
        F.sum(
            F.when(F.col("relevance") == 1,
                   1.0 / F.log2(F.col("counter") + 1.0)).otherwise(0.0)
        ).alias("dcg"),
    )
    r_per_q = judgments.where(F.col("relevance") == 1).groupBy("qid").agg(
        F.count(F.lit(1)).alias("r")
    )
    # IDCG = Σ_{j=0..R-1} 1/log2(j+2) as a sequence aggregate (no UDF)
    idcg = F.aggregate(
        F.sequence(F.lit(0), F.col("r") - 1),
        F.lit(0.0),
        lambda acc, jj: acc + 1.0 / F.log2(jj.cast("double") + 2.0),
    )
    return (
        per_q.where(F.col("found_total") > 0)
        .join(r_per_q, "qid")
        .select(
            "qid",
            F.round(F.col("ap_num") / F.col("found_total"), 6).alias("ap"),
            F.round(F.col("dcg") / idcg, 6).alias("ndcg"),
        )
    )


def metric_aggregates(per_query: DataFrame) -> DataFrame:
    """E4: min/max/avg (+ mean=(max+min)/2, themisEval.java:280-317) over
    the per-query metric values."""
    return per_query.agg(
        F.round(F.min("ap"), 6).alias("ap_min"),
        F.round(F.max("ap"), 6).alias("ap_max"),
        F.round(F.avg("ap"), 6).alias("ap_avg"),
        F.round((F.min("ap") + F.max("ap")) / 2.0, 6).alias("ap_mean"),
        F.round(F.min("ndcg"), 6).alias("ndcg_min"),
        F.round(F.max("ndcg"), 6).alias("ndcg_max"),
        F.round(F.avg("ndcg"), 6).alias("ndcg_avg"),
        F.round((F.min("ndcg") + F.max("ndcg")) / 2.0, 6).alias("ndcg_mean"),
    )


def rbp_err(
    ranked: DataFrame, judgments: DataFrame, k: int = 20, p: float = 0.5
) -> DataFrame:
    """(qid, rbp, err) — the two top-weighted metrics next to prf_mrr's
    set-based ones (neither in the reference's themisEval walk):

    * RBP (Moffat & Zobel TOIS'08, persistence ``p``):
      ``(1-p)·Σ rel_i·p^(rank_i - 1)`` over the top k, full-rank
      positions (unjudged = 0). Truncation residual is ≤ p^k — at the
      default p=0.5, k=20 that is < 1e-6, below the rounding grain.
    * ERR (Chapelle CIKM'09) with binary grades: R_i = rel_i/2, so the
      cascade product Π_{j<i}(1-R_j) collapses to 0.5^(#relevant before
      i) and ``err = Σ rel_i · 0.5^(found_prev+1) / rank_i``.

    The default p=0.5 keeps every power a dyadic rational, exact in a
    double on both engines (the repo's determinism rule); other p's
    work but cross-engine bit-equality then rests on libm pow.
    Queries with no ranked rows drop out naturally; zero-relevant
    queries keep an honest 0.0 (unlike AP's NaN-skip — these metrics
    are well-defined there).
    """
    j = (
        ranked.select("qid", "doc_id", "rank")
        .where(F.col("rank") <= k)
        .join(judgments, ["qid", "doc_id"], "left")
        .fillna(0, ["relevance"])
    )
    w = Window.partitionBy("qid").orderBy("rank")
    walked = j.select(
        "qid", "rank", "relevance",
        (F.sum("relevance").over(w) - F.col("relevance")).alias("_fp"),
    )
    return walked.groupBy("qid").agg(
        F.round(
            F.lit(1.0 - p)
            * F.sum(
                F.col("relevance") * F.pow(F.lit(p), F.col("rank") - 1)
            ),
            6,
        ).alias("rbp"),
        F.round(
            F.sum(
                F.col("relevance")
                * F.pow(F.lit(0.5), F.col("_fp") + 1)
                / F.col("rank")
            ),
            6,
        ).alias("err"),
    )


# --- pure-Python twin (unit-test oracle, reference-shaped walk) ------------


def ap_ndcg_py(
    ranked: list[tuple[int, int]], judged: dict[tuple[int, int], int]
) -> dict[int, tuple[float, float]]:
    """ranked = [(qid, doc_id)] in rank order; judged[(qid, doc_id)] = 0/1.
    Literal transcription of the reference's walk (themisEval.java:94-153,
    :217-273) for cross-checking the DataFrame version."""
    from collections import defaultdict

    by_q: dict[int, list[int]] = defaultdict(list)
    for qid, doc in ranked:
        by_q[qid].append(doc)
    out = {}
    for qid, docs in by_q.items():
        counter = found = 0
        ap_sum = dcg = 0.0
        import math

        for doc in docs:
            rel = judged.get((qid, doc))
            if rel is None:
                continue
            counter += 1
            if rel == 1:
                found += 1
                ap_sum += found / counter
                dcg += 1.0 / math.log2(counter + 1)
        r = sum(
            1 for (q, _d), v in judged.items() if q == qid and v == 1
        )
        idcg = sum(1.0 / math.log2(j + 2) for j in range(r))
        if found > 0:
            out[qid] = (ap_sum / found, dcg / idcg if idcg else float("nan"))
    return out


def prf_mrr(ranked: DataFrame, judgments: DataFrame, k: int = 20) -> DataFrame:
    """(qid, p_at_k, recall_at_k, mrr) — the standard set-based metrics
    the reference's judged-only walk doesn't compute (themisEval.java has
    AP/nDCG only). Unlike AP's counter, these use FULL rank positions:
    precision@k divides by k (unjudged answers count against it),
    recall@k divides by the query's total relevant count, MRR is the
    reciprocal of the first relevant rank (0 when none in the top k).
    Queries with zero relevant docs are skipped, matching the NaN-skip
    convention.
    """
    j = (
        ranked.select("qid", "doc_id", "rank")
        .where(F.col("rank") <= k)
        .join(judgments, ["qid", "doc_id"], "left")
        .fillna(0, ["relevance"])
    )
    per_q = j.groupBy("qid").agg(
        F.sum("relevance").alias("rel_ret"),
        F.min(F.when(F.col("relevance") == 1, F.col("rank"))).alias(
            "first_rel"
        ),
    )
    r_per_q = judgments.where(F.col("relevance") == 1).groupBy("qid").agg(
        F.count(F.lit(1)).alias("r")
    )
    return per_q.join(r_per_q, "qid").select(
        "qid",
        F.round(F.col("rel_ret") / F.lit(float(k)), 6).alias("p_at_k"),
        F.round(F.col("rel_ret") / F.col("r"), 6).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
        ).alias("mrr"),
    )


def paired_randomization_test(
    metrics_a: DataFrame,
    metrics_b: DataFrame,
    metric_col: str = "ap",
    *,
    rounds: int = 256,
) -> DataFrame:
    """One row (n_queries, mean_diff, p_value): two-sided paired
    randomization (sign-flip) test between two rankers' per-query
    metrics — the standard IR significance test [Smucker, Allan &
    Carterette, CIKM'07: randomization beats the t-test's normality
    assumption on skewed AP distributions]. The reference's eval tool
    stops at per-query metrics and aggregates (themisEval.java:94-273);
    deciding whether ranker A actually beats ranker B needs this.

    Under H0 (no difference) each per-query diff's sign is arbitrary, so
    the null distribution is the observed |Σ diff| re-computed under
    ``rounds`` deterministic sign assignments; p = (1 + #{perm ≥ obs})
    / (rounds + 1) (add-one: the identity assignment is always ≥).

    Engine-exactness: diffs are quantized to the house 1e-6 grain and
    summed as BIGINTs — the permutation statistics are INTEGER, so the
    ≥ comparison can never be flipped by float association order in
    either engine. Signs are md5(r:qid) parity — seeded, no RNG.

    Scale: |queries|·rounds rows through one combinable groupBy(r) —
    a million-query eval at 1000 rounds is 10⁹ tiny rows, embarrassingly
    parallel; nothing is per-corpus.
    """
    a = metrics_a.select("qid", F.col(metric_col).alias("ma"))
    b = metrics_b.select("qid", F.col(metric_col).alias("mb"))
    base = a.join(b, "qid").select(
        "qid",
        F.round((F.col("ma") - F.col("mb")) * F.lit(1e6))
        .cast("long").alias("d"),
    )
    obs = base.agg(
        F.abs(F.sum("d")).alias("obs"),
        F.sum("d").alias("sd"),
        F.count("*").alias("n"),
    )
    spark = metrics_a.sparkSession
    rdf = spark.range(1, rounds + 1).select(F.col("id").alias("r"))
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("r").cast("string"), F.lit(":"),
                               F.col("qid").cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    perm = (
        base.crossJoin(F.broadcast(rdf))
        .groupBy("r")
        .agg(F.abs(F.sum(sign * F.col("d"))).alias("s"))
    )
    return perm.crossJoin(F.broadcast(obs)).agg(
        F.min("n").cast("long").alias("n_queries"),
        F.round(F.min("sd") / F.lit(1e6) / F.min("n"), 6).alias("mean_diff"),
        F.round(
            (F.lit(1) + F.sum((F.col("s") >= F.col("obs")).cast("int")))
            / F.lit(float(rounds + 1)),
            6,
        ).alias("p_value"),
    )
