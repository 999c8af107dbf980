"""Brute-force BM25 oracle — pure DataFrame ops, no index.

The analog of the reference's exact-search tier and its ground-truth oracle:
VectorIdsKNNIterator (index/query/iterators/VectorIdsKNNIterator.java:23-113)
scores every candidate doc exactly, and the recall tests compute brute-force
ground truth in-test (RecallTestsIT.java:48-78, TestUtils ground truth).
Here: corpus -> tokenize -> explode -> join query terms -> groupBy(doc) sum.

Used by pytest to assert the engine's top-k is RANK-IDENTICAL (stronger than
recall, per north_rule): same doc ids, same order, scores equal to 1e-6.

Stats semantics match the engine: N/avgdl/df may be supplied explicitly so
pre-compaction (Lucene-style "deletes don't change stats yet") states can be
reproduced; by default they come from the supplied corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysearch.config import IndexConfig
from pysearch.analyze import tokenize_code_text, tokenize_text, with_tokens


def bm25_topk(
    corpus_with_ids: DataFrame,
    query_text: str,
    k: int | None = 10,
    min_score: float | None = None,
    filter_expr: str | None = None,
    config: IndexConfig | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Exact BM25 top-k over an id-carrying corpus (doc_id + repo_files cols).

    Returns (doc_id, score) ordered by (score desc, doc_id asc) — ties broken
    by ascending doc_id exactly like the engine (Lucene doc-order tiebreak).
    """
    config = config or IndexConfig()
    code_aware = bool(config.extra.get("code_aware"))
    qfn = tokenize_code_text if code_aware else tokenize_text

    toks = with_tokens(corpus_with_ids, "content", code_aware=code_aware)
    posting = toks.select("doc_id", "dl", F.explode("tokens").alias("term"))

    # quoted phrases: exact adjacent token runs become a filter (the engine's
    # positions tier), the component terms still score as BM25 terms
    from pysearch.query import parse_phrases

    query_text, phrases = parse_phrases(query_text, qfn)
    phrase_filter = None
    if phrases:
        joined = F.concat(F.lit(" "), F.array_join("tokens", " "), F.lit(" "))
        cond = None
        for p in phrases:
            c = joined.contains(" " + " ".join(p) + " ")
            cond = c if cond is None else (cond & c)
        phrase_filter = toks.where(cond).select("doc_id")

    # same analysis as the engine, including trailing-* prefix expansion
    # (expansion over the corpus vocabulary = the engine's dictionary)
    terms: list[str] = []
    for raw in query_text.split():
        if raw.endswith("*") and len(raw) > 1:
            base = qfn(raw[:-1])
            if not base:
                continue
            rows = (
                posting.where(F.col("term").startswith(base[-1]))
                .select("term")
                .distinct()
                .orderBy("term")
                .limit(50)
                .collect()
            )
            terms.extend(r["term"] for r in rows)
        else:
            terms.extend(qfn(raw))
    terms = list(dict.fromkeys(terms))

    if stats is None:
        row = toks.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    else:
        n_docs, avgdl = stats

    if not terms or n_docs == 0:
        return corpus_with_ids.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )

    tf = (
        posting.where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # idf over the tiny term set — broadcast to the scoring join
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(config.k1)
                * (F.lit(1.0 - config.b) + F.lit(config.b) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )
    if filter_expr is not None:
        allowed = corpus_with_ids.where(filter_expr).select("doc_id")
        scored = scored.join(allowed, "doc_id", "left_semi")
    if phrase_filter is not None:
        scored = scored.join(phrase_filter, "doc_id", "left_semi")
    # same 1e-9-rounded ranking + doc_id tiebreak as the engine (exact ties
    # must order identically regardless of float summation order)
    rank_score = F.round(F.col("score"), 9)
    if min_score is not None:
        return scored.where(F.col("score") >= min_score).orderBy(
            F.desc(rank_score), F.asc("doc_id")
        )
    return scored.orderBy(F.desc(rank_score), F.asc("doc_id")).limit(k)


def custom_score_topk(
    corpus_with_ids: DataFrame,
    query_text: str,
    score_fn,
    k: int = 10,
    filter_expr: str | None = None,
    config: IndexConfig | None = None,
) -> DataFrame:
    """User-pluggable exact scoring — the script-score analog
    (plugin/script/KNNScoringScriptEngine.java:20-35, KNNScoringUtil.java:
    100-411: arbitrary kernels evaluated exactly per candidate doc).

    `score_fn(tf, df, dl, n_docs, avgdl) -> Column` builds the per-(doc,
    term) contribution from Spark Columns; contributions are summed per doc.
    Because the hook is a Column EXPRESSION (not a UDF), Catalyst codegens it
    — the fast path for custom ranking. Example (pure TF scoring):

        custom_score_topk(df, "spark merge",
                          lambda tf, df_, dl, n, avg: tf / (tf + 1.0))
    """
    config = config or IndexConfig()
    code_aware = bool(config.extra.get("code_aware"))
    qfn = tokenize_code_text if code_aware else tokenize_text
    terms = list(dict.fromkeys(qfn(query_text)))
    toks = with_tokens(corpus_with_ids, "content", code_aware=code_aware)
    row = toks.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    if not terms or n_docs == 0:
        return corpus_with_ids.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    posting = toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
    tf = (
        posting.where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn(
            "part",
            score_fn(
                F.col("tf"),
                F.col("df").cast("double"),
                F.col("dl").cast("double"),
                F.lit(float(n_docs)),
                F.lit(avgdl),
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )
    if filter_expr is not None:
        scored = scored.join(
            corpus_with_ids.where(filter_expr).select("doc_id"), "doc_id", "left_semi"
        )
    return scored.orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")
    ).limit(k)
