"""Lexical ranked retrieval over a document corpus — BM25 search for a
known query-term set and corpus-wide TF-IDF keyword extraction.

Why this lives in a training-data engine: lexical retrieval is the
workhorse of targeted corpus slicing (pull every doc about X for a
domain mix), decontamination audits (find benchmark-phrase hits ranked
by relevance rather than as a boolean screen), and quality-driven
subset selection (DSIR-style importance sampling starts from exactly
these tf / df statistics). It complements the SEMANTIC retrieval
surface (`operators/similarity.py`, `operators/ann_index.py`) with the
sparse half of the classic hybrid-search pair.

Scale shapes:

- ``bm25_search``: the query-term set is tiny and KNOWN, so per-doc
  term frequencies come from scan-local array expressions
  (``F.filter``/``F.size`` over the tokenized text) — the corpus is
  NEVER exploded and NEVER shuffled. The only wide operations are a
  one-row global agg (N, Σdl, per-term document frequencies) broadcast
  back as literals-via-join, and the final ``TakeOrderedAndProject``
  for top-k. At 100 TB this is two column-pruned scans of (id, text)
  and nothing else; contrast an inverted-index build, which pays a
  full explode+shuffle to answer ONE query. (An index pays off only
  when amortized over many queries — that shape is
  ``tfidf_top_terms``'s explode, persisted.)
- ``tfidf_top_terms``: per-doc top-N distinctive terms needs the full
  (doc, term) tf relation — one explode + groupBy(doc, term) shuffle
  (map-side combined), a broadcast join of the V-row df table, and a
  per-doc WindowGroupLimit (rank ≤ N prunes map-side before the final
  exchange). Rows after the first agg are distinct (doc, term) pairs,
  already far smaller than the token stream.

FP-parity discipline (the `perplexity_docs` pattern): every per-term
score contribution is computed in double from EXACT integer inputs
(tf, df, dl, N are counts; avgdl = Σdl/N with Σdl an exact BIGINT sum),
then pre-rounded to a 7-dp DECIMAL before the per-doc sum — decimal
addition is order-independent, so Spark's partial aggregation and
DuckDB's single-threaded fold produce hash-identical totals. Only the
final reported score converts back to double (6-dp).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize


def _bm25_contrib(
    tf: Column, dfreq: Column, dl: Column, n_docs: Column, avgdl: Column,
    k1: float, b: float,
) -> Column:
    """One query term's BM25 contribution, 7-dp decimal. idf is the
    always-positive BM25+ form ln(1 + (N - df + .5)/(df + .5))."""
    idf = F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - dfreq.cast("double") + F.lit(0.5))
        / (dfreq.cast("double") + F.lit(0.5))
    )
    tfd = tf.cast("double")
    norm = tfd * (F.lit(k1) + F.lit(1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl.cast("double") / avgdl)
    )
    return F.round(idf * norm, 7).cast("decimal(20,7)")


def bm25_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Rank documents against ``query_terms`` by BM25; returns the
    ``top_k`` matching docs as ``<id_col> | score | n_matched | dl``
    (score 6-dp double, ties broken id-ascending; docs matching no
    term never appear).

    Plan: tokenize once per scan; per-term tf via ``F.size(F.filter(
    tokens, t == term))`` — scan-local, no explode. Corpus stats (N,
    Σdl as exact BIGINT, per-term df) reduce to ONE row, broadcast
    back; score is a scan-local decimal sum of per-term contributions;
    top-k is a TakeOrderedAndProject. Zero corpus-sized shuffles.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if any(t is None or t == "" or t != t.strip().lower() for t in terms):
        raise ValueError(
            "query_terms must be non-empty, lowercase, and stripped "
            f"(got {query_terms!r})"
        )
    toks = tokenize(F.lower(F.col(text_col)))
    def _count_of(term: str) -> Column:
        # single-arg lambda (a (x, t=…) default would read as Spark's
        # two-arg (element, index) filter form)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_count_of(t).alias(f"_tf_{i}") for i, t in enumerate(terms)]
    narrow = df.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    )
    stats = narrow.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    scored = narrow.join(F.broadcast(stats))
    contribs = [
        F.when(
            F.col(f"_tf_{i}") > 0,
            _bm25_contrib(
                F.col(f"_tf_{i}"), F.col(f"_df_{i}"), F.col("_dl"),
                F.col("_n_docs"), avgdl, k1, b,
            ),
        ).otherwise(F.lit("0").cast("decimal(20,7)"))
        for i in range(len(terms))
    ]
    matched = [
        (F.col(f"_tf_{i}") > 0).cast("int") for i in range(len(terms))
    ]
    out = (
        scored.select(
            F.col(id_col),
            sum(contribs[1:], contribs[0]).alias("_score_dec"),
            sum(matched[1:], matched[0]).alias("n_matched"),
            F.col("_dl").cast("bigint").alias("dl"),
        )
        .where(F.col("n_matched") > 0)
        .orderBy(F.col("_score_dec").desc(), F.col(id_col).asc())
        .limit(top_k)
        .select(
            F.col(id_col),
            # round the DECIMAL (exact HALF_UP on the 7-dp grid) before
            # the double cast — rounding after the cast can flip a
            # …xxx5 boundary value differently per engine
            F.round(F.col("_score_dec"), 6).cast("double").alias("score"),
            "n_matched",
            "dl",
        )
    )
    return out


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-``top_n`` distinctive terms by TF-IDF:
    ``<id_col> | term | rank | tfidf`` (rank 1..n, score 6-dp double,
    ties broken term-ascending). ``min_df`` drops corpus-noise terms
    seen in fewer than that many documents.

    tf = in-doc count, idf = ln(N / df) with df = docs containing the
    term (so corpus-universal terms score 0 and never rank). ONE
    explode + ONE groupBy(doc, term) shuffle (map-side combined) onto a
    PERSISTED (doc, term, tf) relation shared by both consumers; df is
    then ``tf.groupBy(term).count()`` — a partially-aggregated shuffle
    whose hot-term traffic is map-side combined down to one partial per
    task, so a stopword with df ≈ N never concentrates N rows in a
    single task (the failure mode of the previous
    ``COUNT().over(Window.partitionBy(term))`` shape: window partitions
    are NOT partially aggregated, so one task would materialize every
    (doc, term) row of the hottest term — a job-killer at 10¹⁰ docs).
    The min_df-pruned V-row (term, df) table broadcast-joins back onto
    tf, so the pair relation itself never reshuffles on term. The
    persist is what makes the second consumer free — without it
    Catalyst duplicates the unpersisted subtree and the corpus explode
    runs twice (same pattern as classifier.py's counts relation). N
    broadcasts as a one-row cross join; the per-doc rank window's
    ``rank <= n`` predicate executes as WindowGroupLimit (map-side
    top-n pruning before the exchange).
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = (
        toks.groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    df_tab = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    scored = (
        tf.join(F.broadcast(df_tab), "term")
        .join(F.broadcast(n_docs))
        .select(
            "_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
                7,
            )
            .cast("decimal(20,7)")
            .alias("_s"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("_id").alias(id_col),
            "term",
            F.col("rank").cast("int").alias("rank"),
            # decimal-first rounding: see bm25_search's score note
            F.round(F.col("_s"), 6).cast("double").alias("tfidf"),
        )
    )


def rrf_fuse(
    ranked_lists,
    id_col: str,
    k: int = 60,
    top_k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack &
    Clarke 2009 — the standard way to combine lexical BM25 with
    semantic ANN into hybrid search): score(d) = Σ_lists 1/(k + rank).

    Each input DataFrame must carry ``id_col`` and an integer ``rank``
    (1-based). Returns ``<id_col> | rrf_score | n_lists`` for the
    fused top-``top_k`` (score desc, id asc; ``n_lists`` = how many
    lists proposed the doc).

    Per-rank contributions are pre-rounded 9-dp decimals so the fused
    sums are order-independent and engine-exact (ranks are small
    integers — the double division is identical everywhere, and the
    decimal grid makes the final ordering portable).

    Scale: candidate lists are top-k outputs — driver-small by
    construction; fusion is a union + one tiny groupBy. The heavy
    lifting (corpus scans, index probes) stays in the upstream
    retrievers.
    """
    if not ranked_lists:
        raise ValueError("ranked_lists must be non-empty")
    if k < 1 or top_k < 1:
        raise ValueError("k and top_k must be >= 1")
    contribs = [
        d.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(k) + F.col("rank").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("_c"),
        )
        for d in ranked_lists
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return (
        unioned.groupBy(id_col)
        .agg(
            F.sum("_c").alias("_s"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("_s").desc(), F.col(id_col).asc())
        .limit(top_k)
        .select(
            F.col(id_col),
            F.col("_s").cast("double").alias("rrf_score"),
            F.col("n_lists").cast("int").alias("n_lists"),
        )
    )


def with_rank(df: DataFrame, order_cols, id_col: str) -> DataFrame:
    """Attach a 1-based ``rank`` column by (order_cols…, id asc) — the
    adapter between a top-k retriever's ordered output and
    :func:`rrf_fuse`. Meant for ALREADY-REDUCED candidate lists (≤ a
    few hundred rows), where the single-partition window is free."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols, F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w).cast("int"))


def ndcg_discounts(k: int) -> list[int]:
    """The nDCG rank-discount table ``1/log2(rank+1)`` for ranks 1..k,
    as integer picounits (×10¹²) — the single source of truth embedded
    as literals in both the Spark plan and any SQL oracle mirror, so
    DCG sums are exact integer arithmetic everywhere."""
    import math

    return [int(round(1e12 / math.log2(i + 1))) for i in range(1, k + 1)]


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    grade_col: Optional[str] = None,
) -> DataFrame:
    """Per-query IR evaluation — the measurement half of the retrieval
    surface (evaluate BM25 / ANN / hybrid runs against labeled
    relevance judgments, TREC-style):

    - ``recall_at_k``   = relevant retrieved in the top k / all relevant
    - ``precision_at_k`` = relevant retrieved in the top k / k
    - ``reciprocal_rank`` = 1 / rank of the first relevant hit (0 if
      none in the top k) — average it for MRR
    - ``ndcg_at_k`` = DCG/IDCG with binary gains: each hit contributes
      ``1/log2(rank+1)``, the ideal stacks the ``min(n_rel, k)`` best
      ranks. The k discount constants are computed ONCE driver-side as
      integer picounits (``round(1e12/log2(i+1))``) and embedded as
      literals, so DCG is an exact integer sum — order-independent and
      bit-identical in any engine (JVM and C ``log2`` can disagree by
      an ulp; a shared literal table cannot). Mirror the same constants
      in a SQL oracle (see ``_RETRIEVAL_EVAL_SQL``).

    ``results``: one row per (query, doc) with a 1-based rank (a
    retriever's output); rows past ``k`` are ignored. ``qrels``: the
    relevant (query, doc) pairs (duplicates tolerated). Queries present
    in ``results`` but absent from ``qrels`` are dropped (recall is
    undefined without judgments); judged queries the retriever missed
    entirely score 0. Every metric derives from integer counts with one
    final division rounded 6 dp — engine-exact for oracle checking.

    Scale shape: the top-k cut happens FIRST, so everything downstream
    is ≤ |queries|·k rows; two query-keyed partial aggs + one join —
    corpus-independent cost.

    ``grade_col`` (r9): TREC qrels carry graded labels; pass the
    integer grade column (0 = judged irrelevant, must be < 63) to
    switch nDCG to the standard graded form with gains ``2^rel − 1``.
    Gains and the picounit discounts stay exact-integer (gain×discount
    ≤ 2⁶²·10¹² only for absurd grades — realistic 0-4 grades are
    microscopic), so graded DCG/IDCG sums remain order-independent and
    engine-exact. The ideal stacks the query's own grades sorted
    descending (a per-query ``collect_list`` over its JUDGMENTS — human
    labels, bounded by assessment budget, never corpus-sized). Binary
    recall/precision/RR treat grade > 0 as relevant, matching the
    binary path on 0/1 grades (law-tested); ``grade_col=None`` is the
    binary path, bit-for-bit unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if grade_col is not None:
        return _graded_retrieval_metrics(
            results, qrels, query_col, doc_col, rank_col, k, grade_col
        )
    rels = qrels.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()
    rel_n = rels.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        results.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(rank_col).alias("_r"),
        )
        .join(rels, ["_q", "_d"])
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("_r").alias("_first"),
            F.sum(
                F.element_at(
                    F.array(*[F.lit(d) for d in ndcg_discounts(k)]),
                    F.col("_r").cast("int"),
                )
            ).alias("_dcg"),
        )
    )
    # ideal DCG for r relevant docs at cut k: the best min(r, k) ranks
    prefix = [0]
    for d in ndcg_discounts(k):
        prefix.append(prefix[-1] + d)
    ideal = F.element_at(
        F.array(*[F.lit(p) for p in prefix[1:]]),
        F.least(F.col("n_rel"), F.lit(k)).cast("int"),
    )
    return (
        rel_n.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.col("n_rel").cast("bigint").alias("n_rel"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
            ).alias("reciprocal_rank"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0)).cast("double")
                / ideal.cast("double"),
                6,
            ).alias("ndcg_at_k"),
        )
    )


def _graded_retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int,
    grade_col: str,
) -> DataFrame:
    """Graded-gain branch of :func:`retrieval_metrics` — same output
    schema and join shape; DCG gains are ``2^grade − 1`` (exact-integer
    via shiftleft) and IDCG stacks the query's own grades sorted
    descending. Duplicate judgments keep the max grade."""
    disc = ndcg_discounts(k)
    disc_arr = "array(" + ",".join(f"{d}L" for d in disc) + ")"
    rels = (
        qrels.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(grade_col).cast("int").alias("_g"),
        )
        .groupBy("_q", "_d")
        .agg(F.max("_g").alias("_g"))
        .where(F.col("_g") > 0)
    )
    rel_n = rels.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_rel"),
        # ideal gain stack: this query's grades, best first, cut to k
        F.expr(
            f"aggregate(zip_with("
            f"slice(concat(sort_array(collect_list(_g), false),"
            f" array_repeat(0, {k})), 1, {k}), {disc_arr},"
            f" (g, d) -> (shiftleft(1L, g) - 1) * d),"
            f" 0L, (acc, x) -> acc + x)"
        ).alias("_idcg"),
    )
    hits = (
        results.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(rank_col).alias("_r"),
        )
        .join(rels, ["_q", "_d"])
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("_r").alias("_first"),
            F.sum(
                F.expr(
                    f"(shiftleft(1L, _g) - 1)"
                    f" * element_at({disc_arr}, cast(_r as int))"
                )
            ).alias("_dcg"),
        )
    )
    return (
        rel_n.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.col("n_rel").cast("bigint").alias("n_rel"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
            ).alias("reciprocal_rank"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0)).cast("double")
                / F.col("_idcg").cast("double"),
                6,
            ).alias("ndcg_at_k"),
        )
    )


def assemble_context(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    token_budget: int,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """RAG-style context assembly: retrieve the BM25 top-``top_k``
    candidates, then greedily keep them in relevance order until the
    next document would overflow ``token_budget`` whitespace tokens —
    the retrieval → packing composition every retrieval-augmented
    serving stack runs per request.

    Output: the KEPT documents as ``<id_col> | rank | score | dl |
    cum_tokens`` (rank 1.. in (score desc, id asc) order over the
    ROUNDED scores — deterministic and engine-mirrorable; a doc is kept
    iff its running token total fits the budget; docs after the first
    overflow may still fit and are skipped individually — greedy, not
    knapsack, like every production assembler).

    Scale shape: the expensive half is `bm25_search` (two column-pruned
    corpus scans, zero corpus shuffles — or use
    :func:`assemble_context_from_hits` over ``bm25_search_postings``
    for the zero-scan serving path, law-equal output); everything after
    operates on ≤ ``top_k`` rows, where the single-partition rank
    window is free."""
    hits = bm25_search(
        df, text_col, id_col, query_terms, k1=k1, b=b, top_k=top_k
    )
    return assemble_context_from_hits(hits, id_col, token_budget)


def assemble_context_from_hits(
    hits: DataFrame, id_col: str, token_budget: int
) -> DataFrame:
    """The retrieval-agnostic packing half of :func:`assemble_context`:
    greedy token-budget assembly over an ALREADY-RETRIEVED candidate
    set (``<id_col> | score | dl``, any retriever). Pass
    ``bm25_search`` output for the scan shape or
    ``streaming/term_stats.bm25_search_postings`` for the zero-scan
    serving shape — the two retrievers are bit-identical on the same
    corpus (law-tested), so the assembled context is too. Same output
    contract and greedy skip-individually semantics as
    :func:`assemble_context`."""
    from pyspark.sql import Window

    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    ranked = hits.select(
        F.col(id_col),
        F.row_number().over(w).cast("int").alias("rank"),
        "score",
        "dl",
    )
    # greedy skip-individually semantics: running total of KEPT docs
    # only — an array fold over the (≤ top_k)-row collected list, then
    # re-exploded; all driver-free, all bounded by top_k. The fold
    # accumulator's id field takes the INPUT id column's type (string
    # ids fold as strings — nothing is silently cast to bigint).
    id_dt = hits.schema[id_col].dataType.simpleString()
    folded = ranked.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct("rank", F.col(id_col), "score", "dl"))
        ).alias("_h")
    ).select(
        F.explode(
            F.aggregate(
                F.col("_h"),
                F.struct(
                    F.lit(0).cast("bigint").alias("cum"),
                    F.array().cast(
                        f"array<struct<rank:int,id:{id_dt},score:double,"
                        "dl:bigint,cum_tokens:bigint>>"
                    ).alias("kept"),
                ),
                lambda acc, h: F.when(
                    acc["cum"] + h["dl"] <= F.lit(int(token_budget)),
                    F.struct(
                        (acc["cum"] + h["dl"]).alias("cum"),
                        F.concat(
                            acc["kept"],
                            F.array(
                                F.struct(
                                    h["rank"].alias("rank"),
                                    h[id_col].cast(id_dt).alias("id"),
                                    h["score"].alias("score"),
                                    h["dl"].alias("dl"),
                                    (acc["cum"] + h["dl"]).alias("cum_tokens"),
                                )
                            ),
                        ).alias("kept"),
                    ),
                ).otherwise(acc),
                lambda acc: acc["kept"],
            )
        ).alias("_k")
    ).select(
        F.col("_k.id").alias(id_col),
        F.col("_k.rank").alias("rank"),
        F.col("_k.score").alias("score"),
        F.col("_k.dl").alias("dl"),
        F.col("_k.cum_tokens").alias("cum_tokens"),
    )
    return folded.orderBy("rank")
