"""Post-retrieval processors: grouped (nested-field) retrieval and MMR
diversification — the search-pipeline analogs.

* group_top_docs — per-parent best child (the nested-field search analog,
  NestedKnnVectorQueryFactory.java:1-77 / GroupedNestedDocIdSetIterator:
  parent = repo/source group, child = doc): Window.partitionBy(group).
* mmr_oversample + mmr_rerank — MMROverSampleProcessor.java:230-243 bumps
  the fetch size to `candidates` (default 3x), MMRRerankProcessor.java:190-242
  then greedily selects by  score = (1-λ)·relevance − λ·max_sim_to_selected
  (docs/mmr_search.md:10-45). k is small (<= 10k) so the greedy loop runs
  driver-side on numpy over the already-reduced candidate set — exactly like
  the reference's coordinator-side processor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MMR_OVERSAMPLE_DEFAULT = 3  # MMROverSampleProcessor default candidates = 3x


def group_top_docs(
    scored: DataFrame, group_col: str, k_per_group: int = 1, score_col: str = "score"
) -> DataFrame:
    """Best `k_per_group` docs per group, ties by ascending doc_id."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc(F.round(F.col(score_col), 9)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank_in_group", F.row_number().over(w))
        .where(F.col("rank_in_group") <= k_per_group)
    )


def group_scores(
    scored: DataFrame,
    group_col: str,
    score_col: str = "score",
    k_groups: int | None = None,
) -> DataFrame:
    """Per-parent score aggregation — the nested-search ScoreMode analog
    (Lucene ToParentBlockJoin max/total/none; the reference's nested factory
    scores a parent by its best child): every matched group with its
    max/sum/count of child scores, optionally truncated to the `k_groups`
    best by (max desc, group asc). Sum and count are emitted instead of avg
    so exact-value verification never depends on division order."""
    agg = scored.groupBy(group_col).agg(
        F.max(score_col).alias("max_score"),
        F.sum(score_col).alias("sum_score"),
        F.count(F.lit(1)).cast("long").alias("n_children"),
    )
    if k_groups is not None:
        agg = agg.orderBy(
            F.desc(F.round(F.col("max_score"), 9)), F.asc(group_col)
        ).limit(k_groups)
    return agg


def expand_group_docs(
    parents_topk: DataFrame,
    all_children: DataFrame,
    group_col: str,
    parent_score_col: str = "score",
) -> DataFrame:
    """Expand-nested analog (ExpandNestedDocsQuery.java:1-141): given the
    per-group winners of a grouped search, return ALL children of every
    matched group — the reference returns every nested doc of a matched
    parent, not just the best one. The parent's (group) best score is
    attached to each child so callers can rank groups.

    Plan shape: the matched-group side is top-k-sized (tiny), so it
    broadcasts into the children scan — one pass over the child table, no
    shuffle of the big side."""
    parents = parents_topk.groupBy(group_col).agg(
        F.max(parent_score_col).alias("parent_score")
    )
    return all_children.join(F.broadcast(parents), group_col, "inner")


def mmr_rerank(
    candidates: pd.DataFrame,
    embeddings: dict[int, np.ndarray] | pd.DataFrame,
    k: int,
    lam: float = 0.5,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> pd.DataFrame:
    """Greedy Maximal-Marginal-Relevance over <= oversampled-k candidates.

    candidates: pandas frame (id, relevance score), already top-(k*oversample)
    embeddings: id -> vector (similarity space for the diversity term)
    Returns the selected rows in MMR order with the mmr score attached.
    """
    if isinstance(embeddings, pd.DataFrame):
        embeddings = {
            int(r[id_col]): np.asarray(r["embedding"], dtype=np.float64)
            for _, r in embeddings.iterrows()
        }
    cand = candidates.sort_values(
        [score_col, id_col], ascending=[False, True]
    ).reset_index(drop=True)
    ids = cand[id_col].to_numpy(dtype=np.int64)
    rel = cand[score_col].to_numpy(dtype=np.float64)
    V = np.stack([embeddings[int(i)] for i in ids])
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    sim = V @ V.T  # pairwise-similarity cache (MMRRerankProcessor analog)

    n = len(ids)
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if selected:
            mmr = (1 - lam) * rel - lam * max_sim
        else:
            mmr = (1 - lam) * rel
        mmr_masked = np.where(remaining, mmr, -np.inf)
        # deterministic: best mmr, ties by doc_id ascending (ids sorted by
        # relevance first, stable argmax picks the first = lowest-id tie)
        pick = int(np.argmax(mmr_masked))
        selected.append(pick)
        remaining[pick] = False
        max_sim = np.maximum(max_sim, sim[pick])
    out = cand.iloc[selected].copy()
    out["mmr_rank"] = range(1, len(selected) + 1)
    return out.reset_index(drop=True)
