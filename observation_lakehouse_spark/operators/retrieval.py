"""Ranked retrieval and frequency-sketch operators over the documents table.

The reference's analytics surface stops at exact aggregation; a training-data
lakehouse also needs the search-side primitives — ranked retrieval over the
corpus (BM25), exact phrase lookup, and sublinear frequency estimation
(count-min sketch) whose state is MERGEABLE across partitions, which is what
makes it work on a 1000-executor cluster: each executor sketches its split,
the (depth × width) integer grid sums across splits, and the merged grid
answers point queries with the usual CMS overestimate-only guarantee.

Every hash here is the md5-prefix family (functions/text.py:tok_hash60
rationale) so each operator is differentially testable against a DuckDB
oracle — same buckets, same estimates, bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.text import lower_tokens, md5_hi32


def _bucket(term: Column, row: Column, width: int) -> Column:
    """Row ``i``'s CMS bucket for ``term``: md5-prefix of ``cms<i>|term``.

    Cross-engine: DuckDB computes the identical value with
    ``('0x' || substr(md5('cms' || i || '|' || term), 1, 8))::BIGINT % width``.
    """
    return md5_hi32(F.concat(F.lit("cms"), row.cast("string"), F.lit("|"), term)) % width


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 512,
    k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) vs exact truth for the
    corpus's ``k`` most frequent terms.

    Build: one explode + term hash-aggregate collapses the corpus to its
    vocabulary (map-side combined — the only shuffle that sees data volume),
    then the sketch grid is an aggregate OVER THE VOCABULARY: ``depth`` rows
    per distinct term, summed into ``depth × width`` counters. At 100 TB the
    grid is a few KiB of state no matter the corpus size, and because the
    build is a plain SUM it merges associatively across any partitioning —
    the property that lets per-executor sketches combine into one.

    Answer: each heavy hitter probes its ``depth`` buckets and takes the MIN
    — estimates can only overestimate (collisions add, never subtract), which
    the output exposes as ``overestimate = cms_est - exact_cnt >= 0``.
    """
    # persist(): the corpus collapses to its vocabulary exactly once; grid,
    # top and probes all re-read the (tiny) cached aggregate instead of
    # re-exploding the corpus per consumer.
    exact = (
        df.select(F.explode(lower_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .persist()
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    # Sketch grid: depth buckets per VOCABULARY entry (not per token).
    grid = (
        exact.select(rows, "term", "exact_cnt")
        .select("i", _bucket(F.col("term"), F.col("i"), width).alias("b"), "exact_cnt")
        .groupBy("i", "b")
        .agg(F.sum("exact_cnt").alias("c"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("term")).limit(k)
    probes = top.select("term", "exact_cnt", rows).select(
        "term", "exact_cnt", "i", _bucket(F.col("term"), F.col("i"), width).alias("b")
    )
    out = (
        probes.join(F.broadcast(grid), ["i", "b"])
        .groupBy("term")
        .agg(F.first("exact_cnt").alias("exact_cnt"), F.min("c").alias("cms_est"))
        .select(
            "term",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
    )
    out._cached_deps = (exact,)  # type: ignore[attr-defined]  # noqa: SLF001
    return out


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents for a bag-of-words query.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (Robertson/Spärck Jones).

    Cross-engine float discipline: each per-term contribution is ROUNDED to
    6dp and cast to DECIMAL(18,6) BEFORE the per-document sum, so the sum is
    exact integer arithmetic — a float SUM's addend order (nondeterministic
    under grouping) can never flip a rank. ``avgdl`` is computed explicitly
    as sum/count, not AVG, so both engines evaluate the identical division.

    Shape: the token explode filters to the query's terms AT THE EXPLODE
    (predicate on the exploded column — the corpus collapses to query-term
    postings immediately); doc lengths ride the same scan; df/N/avgdl are
    vocabulary- or single-row aggregates broadcast into the scoring join.
    """
    # persist(): base (doc_id, dl) and tf (query-term postings) are each read
    # by two consumers; caching them caps the corpus text scans at two —
    # without it Catalyst re-inlines the token split under stats, dfreq AND
    # the scoring join (8 scans of the text column observed in the plan).
    base = df.select(
        F.col(id_col).alias("doc_id"), F.size(lower_tokens(text_col)).alias("dl")
    ).persist()
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias("avgdl"),
    )
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"), F.explode(lower_tokens(text_col)).alias("term")
        )
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(base, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("w").cast("double").alias("score"), F.count(F.lit(1)).alias("n_terms_hit")
    )
    # Distributed top-k FIRST (TakeOrderedAndProject — per-partition heads,
    # never a single-partition sort of every matching doc), then rank the k
    # survivors with a window that only ever sees k rows.
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "score", "n_terms_hit")
        .orderBy("rank")
    )
    out._cached_deps = (base, tf)  # type: ignore[attr-defined]  # noqa: SLF001
    return out


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase lookup: documents containing ``phrase`` as consecutive
    tokens, with occurrence counts.

    The positional index is implicit: the token array is shifted ``len(phrase)``
    ways with ``slice`` and zipped back into n-gram rows (the same carried-array
    idiom as repetition_score's bigrams — no positional self-join, no shuffle of
    positions), then one equality filter + per-doc count. At scale this is a
    map-only scan + one tiny aggregate over matching docs.
    """
    n = len(phrase)
    toks = lower_tokens(text_col)
    target = " ".join(t.lower() for t in phrase)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    win = F.size("_toks") - F.lit(n - 1)
    grams = [
        F.slice(F.col("_toks"), i + 1, F.greatest(win, F.lit(0))) for i in range(n)
    ]
    joined = grams[0]
    for g in grams[1:]:
        joined = F.zip_with(joined, g, lambda a, bb: F.concat_ws(" ", a, bb))
    ex = base.select("doc_id", F.explode(joined).alias("gram"))
    return (
        ex.filter(F.col("gram") == target)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
    )


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k_each: int = 20,
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR'09): BM25 top-``k_each`` for the
    term query and exact-cosine top-``k_each`` for the query vector, each
    contributing ``floor(1e6 / (rrf_k + rank))`` integer micro-points; final
    top-``k`` orders by the summed RRF score (ties on doc id). The standard
    first-stage retriever of a RAG / retrieval-curation pipeline — lexical
    recall catches exact-term matches embeddings blur, dense recall catches
    paraphrases BM25 misses, and RRF needs no score calibration between the
    two scales (rank-only fusion).

    At 100 TB: both legs bound their output BEFORE fusion — BM25's corpus
    work collapses to query-term postings at the explode and pre-prunes with
    TakeOrderedAndProject (retrieval.py:bm25_rank), the dense leg is one
    broadcast query row against the embedding scan with the same
    distributed top-k — so fusion is a ``k_each``-row full-outer join and
    no window ever sees more than ``k_each`` rows. The dense leg here is
    the exact scan (one query); at corpus scale it swaps for the bucketed
    ANN paths (lsh_ann_topk / ivfadc_topk) with the same (doc, rank)
    contract. Kept fully relational (zip_with/aggregate dot fold — the SQL
    oracle's exact expression tree) so repeated runs CacheManager-match.

    Returns (rank, doc_id, lex_rank, sem_rank, rrf_micro); ``lex_rank`` /
    ``sem_rank`` are NULL for docs the other leg alone surfaced.
    """
    from observation_lakehouse_spark.operators.similarity import cosine_similarity

    lex = bm25_rank(docs, query_terms, text_col=text_col, id_col=doc_id_col, k=k_each)
    lex_sel = lex.select(F.col("doc_id"), F.col("rank").alias("lex_rank"))
    qrow = emb.filter(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv")
    )
    sem_scored = (
        emb.filter(F.col(vec_id_col) != query_vec_id)
        .crossJoin(F.broadcast(qrow))
        .select(
            F.col(vec_id_col).alias("doc_id"),
            F.round(cosine_similarity(F.col(vec_col), F.col("_qv")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    sem_top = sem_scored.orderBy(F.desc("cosine_sim"), F.asc("doc_id")).limit(k_each)
    ws = Window.orderBy(F.desc("cosine_sim"), F.asc("doc_id"))
    sem = (
        sem_top.withColumn("sem_rank", F.row_number().over(ws).cast("int"))
        .select("doc_id", "sem_rank")
    )

    def _contrib(rank_col: Column) -> Column:
        # floor() of an identical IEEE double ratio in both engines — the
        # repo's derived-value discipline (never ROUND a value computed from
        # other computed values).
        return F.coalesce(
            F.floor(
                F.lit(1_000_000.0) / (F.lit(float(rrf_k)) + rank_col.cast("double"))
            ).cast("long"),
            F.lit(0).cast("long"),
        )

    fused = lex_sel.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (_contrib(F.col("lex_rank")) + _contrib(F.col("sem_rank"))).alias("rrf_micro"),
    )
    topk = fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    out = (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "lex_rank", "sem_rank", "rrf_micro")
        .orderBy("rank")
    )
    out._cached_deps = getattr(lex, "_cached_deps", ())  # type: ignore[attr-defined]  # noqa: SLF001
    return out


def ndcg_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k per query — the standard graded retrieval-quality metric
    (Järvelin & Kekäläinen, TOIS 2002), computed as exact integer
    arithmetic so the score is engine- and partitioning-independent.

    Inputs: ``ranking`` (query_col, doc_col, rank_col with rank 1-based) and
    graded ``qrels`` (query_col, doc_col, rel_col, integer grades ≥ 0).

    Determinism: the per-rank discount 1/log2(rank+1) is the one float in
    nDCG — it is precomputed DRIVER-SIDE as ``floor(1e6 / log2(r+1))``
    micro-units for r = 1..k and folded into the plan as literals, so both
    engines (and the SQL oracle) multiply identical integer constants.
    gain = 2^rel − 1 (exact shift), DCG/IDCG are integer sums, and
    ndcg_ppm = (dcg × 1e6) DIV idcg — never a float division that could
    round differently. IDCG ranks each query's qrels by (rel DESC, doc ASC).

    Scale shape: ranking is already ≤ k rows per query; qrels joins on
    (query, doc) and the ideal ranking windows over each query's qrels only
    — nothing touches a corpus. Queries with no positive qrels get NULL
    ndcg (0/0 is undefined, not zero).
    """
    import math

    disc = F.array(
        *[F.lit(int(math.floor(1_000_000 / math.log2(r + 1)))) for r in range(1, k + 1)]
    )
    # SQL shiftleft takes a column bit count; the DataFrame fn only a literal
    gain = lambda c: F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({c} AS INT)) - 1")  # noqa: E731

    topk = ranking.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("int").alias("r"),
    )
    hits = topk.join(
        qrels.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.col(rel_col).alias("rel"),
        ),
        ["q", "d"],
        "left",
    ).withColumn("rel", F.coalesce("rel", F.lit(0)))
    dcg = hits.groupBy("q").agg(
        F.sum(gain("rel") * F.element_at(disc, F.col("r"))).alias("dcg_micro")
    )
    w = Window.partitionBy("q").orderBy(F.desc(rel_col), F.asc("d"))
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .select(F.col(query_col).alias("q"), F.col(doc_col).alias("d"), rel_col)
        .withColumn("ir", F.row_number().over(w))
        .filter(F.col("ir") <= k)
        .groupBy("q")
        .agg(F.sum(gain(rel_col) * F.element_at(disc, F.col("ir"))).alias("idcg_micro"))
    )
    return (
        dcg.join(ideal, "q", "full_outer")
        .select(
            F.col("q").alias(query_col),
            F.coalesce("dcg_micro", F.lit(0)).alias("dcg_micro"),
            F.coalesce("idcg_micro", F.lit(0)).alias("idcg_micro"),
            F.when(
                F.coalesce("idcg_micro", F.lit(0)) > 0,
                F.expr("(COALESCE(dcg_micro, 0) * 1000000) DIV idcg_micro"),
            ).alias("ndcg_ppm"),
        )
        .orderBy(query_col)
    )


def retrieval_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Binary retrieval metrics per query — the workhorse trio next to
    :func:`ndcg_eval`'s graded score: reciprocal rank (MRR's per-query
    term), recall@k and precision@k, all as EXACT parts-per-million
    integers (``x·1e6 DIV y``), so the report is engine- and
    partitioning-independent with no float division anywhere.

    Inputs: ``ranking`` (query, doc, 1-based rank) and BINARY ``qrels``
    (query, doc — presence = relevant). Per query: rr_ppm = 1e6 DIV (rank
    of the FIRST relevant hit) or 0 with no hit in the top k; recall_ppm =
    hits@k·1e6 DIV |qrels(q)|; precision_ppm = hits@k·1e6 DIV k. Queries
    with qrels but no ranking rows still report (all-zero hits); queries
    with no qrels are excluded (recall undefined — the ndcg_eval NULL
    discipline, made explicit by omission).

    Scale shape: the ranking is ≤ k rows per query by contract; qrels
    joins on (query, doc) and aggregates per query — eval-sized, nothing
    corpus-bounded. Returns (query_col, n_rel, hits_at_k, rr_ppm,
    recall_ppm, precision_ppm), query ASC.
    """
    topk = ranking.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("int").alias("r"),
    )
    rel = qrels.select(
        F.col(query_col).alias("q"), F.col(doc_col).alias("d")
    ).distinct()
    n_rel = rel.groupBy("q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = topk.join(rel, ["q", "d"]).groupBy("q").agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        F.min("r").alias("_first"),
    )
    return (
        n_rel.join(hits, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_rel",
            F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
            F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) div _first"), F.lit(0)
            ).alias("rr_ppm"),
            F.expr(
                "CAST(COALESCE(hits_at_k, 0) AS BIGINT) * 1000000 div n_rel"
            ).alias("recall_ppm"),
            F.expr(
                f"CAST(COALESCE(hits_at_k, 0) AS BIGINT) * 1000000 div {int(k)}"
            ).alias("precision_ppm"),
        )
        .orderBy(query_col)
    )


def mmr_rerank(
    candidates: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lambda_ppm: int = 700_000,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98) —
    diversified top-``k`` selection over a RANKED CANDIDATE POOL: each round
    greedily picks ``argmax λ·rel − (1−λ)·max_sim_to_already_picked``. The
    context-selection step of a RAG/training-mix pipeline (don't feed five
    near-identical chunks).

    Inputs: ``candidates`` (query, doc, ``rel_micro`` BIGINT relevance in
    micro-units — e.g. ROUND(bm25·1e6)) and ``sims`` (query, doc_a, doc_b,
    ``sim_micro``) — ONE orientation suffices, the symmetric closure is
    taken here; missing pairs count as similarity 0.

    Exactness: the MMR objective stays UN-divided integer —
    ``mmr = λppm·rel − (1e6−λppm)·maxsim`` (micro² units, BIGINT) — so no
    rounding or division exists to disagree on; ties break on doc id.

    Scale contract: the pool is ASSUMED bounded (top-N per query from
    BM25/ANN — N ≤ hundreds): the k rounds are tiny pool-sized joins, each
    round's selected set eagerly checkpointed so plan depth stays linear in
    k (the bpe_train loop discipline — k driver round-trips, never a
    growing Catalyst tree). Output: (query, pick_rank, doc, rel_micro,
    mmr_micro2), ordered by (query, pick_rank).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lambda_ppm <= 1_000_000:
        raise ValueError("lambda_ppm must be in [0, 1e6]")
    q, d = query_col, id_col
    s0 = sims.select(
        F.col(q).alias("_q"),
        F.col("doc_a").alias("_a"),
        F.col("doc_b").alias("_b"),
        F.col("sim_micro").alias("_s"),
    )
    sym = (
        s0.unionByName(
            s0.select("_q", F.col("_b").alias("_a"), F.col("_a").alias("_b"), "_s")
        )
        .filter(F.col("_a") != F.col("_b"))
        .groupBy("_q", "_a", "_b")
        .agg(F.max("_s").alias("_s"))
    )
    pool = candidates.select(
        F.col(q).alias("_q"), F.col(d).alias("_d"), F.col("rel_micro")
    )
    lam = int(lambda_ppm)
    inv = 1_000_000 - lam
    # Materialize the two loop inputs ONCE (both pool-bounded): every round
    # references them 2-3x, and without truncation each eager round-end
    # checkpoint would re-execute the candidate scorer (BM25/ANN) and the
    # pairwise-sim subtree from scratch — measured 34 s -> ~4 s on the
    # registered 10-doc pool.
    # The loop shuffles a pool-bounded table k times: size the loop's
    # exchanges to the MEASURED pool, not the session default, AND
    # repartition the checkpointed loop inputs to that width — Spark
    # co-partitions a join at the MAX numPartitions of its non-shuffle
    # children, so a 32-partition checkpoint would drag every round back
    # to session width (the graph-loop width discipline). Eager
    # checkpoints keep every round's action inside this conf scope.
    pool = pool.localCheckpoint(eager=True)
    spark = pool.sparkSession
    n_pool = pool.count()
    if n_pool <= 1024:
        # Driver greedy (r12; the connected_components union-find rule): the
        # pool contract above says N <= hundreds, so the k greedy argmax
        # rounds are pure fixed scheduler latency as Spark jobs (~5 rounds x
        # joins + window + checkpoint + union, measured ~4 s at a 10-doc
        # pool) and microseconds as Python. Collect the pool and its
        # pairwise sims and replay the exact integer objective — same
        # argmax, same tie-break, bit-identical output. Pools beyond the
        # guard keep the distributed loop below.
        #
        # The collected sims are semi-join-pruned to the pool's (query, doc)
        # keys FIRST (r12 ADVICE, medium): sims is caller-supplied and can
        # be corpus-scale — the n_pool guard alone bounds only the pool, and
        # the objective never reads a pair outside pool x pool, so pruning
        # both endpoints bounds driver memory at <= N² rows by construction
        # (the prune itself runs distributed; pool is checkpointed and tiny,
        # so each semi-join broadcasts it).
        sym_pruned = sym.join(
            pool.select("_q", F.col("_d").alias("_a")), ["_q", "_a"], "left_semi"
        ).join(
            pool.select("_q", F.col("_d").alias("_b")), ["_q", "_b"], "left_semi"
        )
        return _mmr_driver(spark, pool, sym_pruned, k, lam, inv, q, d)
    loop_parts = max(1, min(spark.sparkContext.defaultParallelism, n_pool // 10_000))
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        pool = pool.repartition(loop_parts).localCheckpoint(eager=True)
        sym = sym.repartition(loop_parts).localCheckpoint(eager=True)
        return _mmr_loop(pool, sym, k, lam, inv, q, d)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)


def _mmr_driver(spark, pool, sym, k, lam, inv, q, d):
    """Driver-side replay of :func:`_mmr_loop` for contract-sized pools:
    identical integer objective (lam·rel − inv·maxsim), identical
    (-mmr, doc id) tie-break, identical output schema and ordering."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    # Duplicate (query, doc) pool rows fold to the max-rel copy — exactly
    # what the distributed loop computes for them (r12 ADVICE, low: the two
    # paths must not diverge across the pool-size boundary): per round the
    # loop's row_number window lets the higher-mmr (= higher-rel, same doc
    # so same maxsim) copy win, and the anti-join then retires EVERY copy
    # of a picked doc, so a lower-rel duplicate can never serve later.
    by_q: dict = {}
    for row in pool.collect():
        docs = by_q.setdefault(row["_q"], {})
        d_, r_ = row["_d"], row["rel_micro"]
        if d_ not in docs or r_ > docs[d_]:
            docs[d_] = r_
    sim: dict = {}
    for row in sym.collect():
        sim[(row["_q"], row["_a"], row["_b"])] = row["_s"]
    out_rows = []
    for qid in by_q:
        remaining = dict(by_q[qid])
        selected: list = []
        for rank in range(1, k + 1):
            if not remaining:
                break
            best = None
            for doc, rel in remaining.items():
                ms = max(
                    (sim.get((qid, doc, s), 0) for s in selected), default=0
                )
                mmr = lam * rel - inv * ms
                key = (-mmr, doc)
                if best is None or key < best[0]:
                    best = (key, doc, rel, mmr)
            _, doc, rel, mmr = best
            out_rows.append((qid, rank, doc, rel, mmr))
            selected.append(doc)
            del remaining[doc]
    fields = {f.name: f.dataType for f in pool.schema.fields}
    schema = StructType(
        [
            StructField(q, fields["_q"]),
            StructField("pick_rank", IntegerType()),
            StructField(d, fields["_d"]),
            StructField("rel_micro", fields["rel_micro"]),
            StructField("mmr_micro2", LongType()),
        ]
    )
    return spark.createDataFrame(out_rows, schema).orderBy(q, "pick_rank")


def _mmr_loop(pool, sym, k, lam, inv, q, d):
    selected = None
    remaining = pool
    for r in range(1, k + 1):
        if selected is None:
            scored = remaining.withColumn("_ms", F.lit(0).cast("long"))
        else:
            sel_keys = selected.select("_q", F.col("_d").alias("_sel"))
            sym2 = sym.select(
                F.col("_q").alias("_q2"), "_a", "_b", "_s"
            )
            scored = (
                remaining.join(sel_keys, "_q")
                .join(
                    sym2,
                    (F.col("_q2") == F.col("_q"))
                    & (F.col("_a") == F.col("_d"))
                    & (F.col("_b") == F.col("_sel")),
                    "left",
                )
                .groupBy("_q", "_d", "rel_micro")
                .agg(F.max(F.coalesce(F.col("_s"), F.lit(0))).alias("_ms"))
            )
        scored = scored.withColumn(
            "_mmr",
            F.lit(lam).cast("long") * F.col("rel_micro")
            - F.lit(inv).cast("long") * F.col("_ms"),
        )
        w = Window.partitionBy("_q").orderBy(F.desc("_mmr"), F.asc("_d"))
        pick = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "_q", "_d", "rel_micro",
                F.col("_mmr").alias("mmr_micro2"),
                F.lit(r).cast("int").alias("pick_rank"),
            )
        )
        selected = (
            pick if selected is None else selected.unionByName(pick)
        ).localCheckpoint(eager=True)
        remaining = remaining.join(
            selected.select("_q", "_d"), ["_q", "_d"], "left_anti"
        )
    return selected.select(
        F.col("_q").alias(q),
        "pick_rank",
        F.col("_d").alias(d),
        "rel_micro",
        "mmr_micro2",
    ).orderBy(q, "pick_rank")
