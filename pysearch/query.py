"""Query path: BM25 top-k retrieval with block-max skipping.

Re-expresses the reference's search pipeline (KNNQueryBuilder.doToQuery ->
per-leaf JVectorReader.search -> global TopDocs reduce,
KNNQueryBuilder.java:376-611, JVectorReader.java:130-211,
index/query/common/QueryUtils.java:48-123):

  parse      Query dataclass: tokenized text, exactly one of k | min_score,
             optional filter predicate (any Spark SQL expr over identity
             columns) — mirrors the knn clause contract
             (KNNQueryBuilder.java:64-81: exactly one of k|max_distance|
             min_score, optional filter).
  plan       broadcast tiny query-term stats (global df summed across live
             segment dictionaries — partition-pruned by term bucket), compile
             filter to per-segment accept/deny doc sets (the accept-bits
             analog, JVectorReader.java:154-164).
  execute    per segment, a cogrouped Arrow UDF runs Block-Max MaxScore:
             terms in descending max-upper-bound order are scored exactly
             (vectorized TAAT) until the remaining terms' summed upper bound
             falls below the running k-th-best score θ; after that cutoff,
             remaining terms only *complete* existing candidates' exact
             scores, and any block whose id range contains no candidate is
             skipped outright — the per-block (max_tf, min_dl) metadata is
             the "approximate score" tier, exact BM25 the "full-precision
             rerank" tier (JVectorReader.java:166-174,353-366 analog).
  reduce     union of per-segment top-(k * overquery) candidates ->
             TakeOrderedAndProject global top-k (ResultUtil.reduceToTopK
             analog), ties broken by ascending doc_id everywhere.

Correctness argument for the skip rule (why ranks stay EXACT): during the
essential phase every block of the term is decoded and every doc seen is
admitted, so a doc unseen when the cutoff fires has zero contribution so far
and a total score <= suffix_ub < θ, while θ is the k-th best *partial* score
— a lower bound on the k-th best final score. Skipping is therefore lossless;
equality always admits (ties can still win on doc_id).

BM25 (Lucene flavor, exact doc lengths):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d)= tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = Σ_t idf(t) * tfn(t,d)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import re as _re

from pysearch.build import bucket_of
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.analyze import tokenize_code_text, tokenize_text

_PHRASE_RE = _re.compile(r'"([^"]*)"')

# serializes the single-query conf tuning (AQE off + sized shuffle) so
# concurrent searches never race the session-conf save/restore; overlapping
# queries simply run untuned (see SearchIndex._single_query_confs)
import threading as _threading

_CONF_LOCK = _threading.Lock()
_POS_SHIFT = np.int64(22)  # doc_id<<22 | position keys (docs < 2^41, dl < 4M)


def parse_phrases(text: str, analyzer) -> tuple[str, list[list[str]]]:
    """Extract quoted phrases ("exact span") from the query text. Returns
    (text with quotes stripped — the phrase terms still score as normal BM25
    terms — and the list of analyzed phrase term sequences)."""
    phrases: list[list[str]] = []

    def repl(m):
        toks = analyzer(m.group(1))
        if len(toks) >= 2:
            phrases.append(toks)
        return " " + m.group(1) + " "

    rest = _PHRASE_RE.sub(repl, text)
    return rest, phrases

# first-pass candidate clamps (RescoreContext.java:22-39,83-99 analog):
# per-segment candidates = clamp(k * oversample) into [MIN, MAX]. When the
# user gives no oversample, the default scales with QUERY WIDTH — the
# dimension-based-default analog: narrow queries yield coarse score
# distributions (few distinct (tf, dl) combinations -> many exact ties), so
# they oversample more, exactly like low-dimension vectors rescore more.
MAX_FIRST_PASS_RESULTS = 10_000
MIN_FIRST_PASS_RESULTS = 100
_WIDTH_OVERSAMPLE = ((10, 1), (4, 2), (0, 3))  # (min_terms, factor)

# filter-selectivity exact-search gate — the SECOND exact-search switch of
# the reference (index.knn.advanced.filtered_exact_search_threshold,
# KNNSettings.java:80 / docs/user_guide.md:1051): when a filter accepts
# fewer docs than this in a segment, score just the accepted docs
# brute-force (decoding only blocks whose id range intersects the accept
# set) instead of running block-max traversal over the whole segment.
# Override per query via Query.params["filtered_exact_search_threshold"].
DEFAULT_FILTERED_EXACT_THRESHOLD = 2048


def first_pass_k(final_k: int, oversample: int | None, n_terms: int, floor: int = 1) -> int:
    """RescoreContext.getFirstPassK analog: user-provided oversample wins;
    otherwise the width-based default (never below `floor`, the config's
    overquery_factor); result clamped into [MIN, MAX]_FIRST_PASS_RESULTS."""
    if oversample is None:
        oversample = max(
            next(f for lo, f in _WIDTH_OVERSAMPLE if n_terms >= lo), floor
        )
    return min(
        MAX_FIRST_PASS_RESULTS, max(MIN_FIRST_PASS_RESULTS, final_k * oversample)
    )


HIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("segment_id", T.StringType()),
        T.StructField("blocks_scanned", T.IntegerType()),
        T.StructField("blocks_skipped", T.IntegerType()),
        T.StructField("strategy", T.StringType()),
    ]
)

_RESTRICT_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("flag", T.IntegerType()),  # 1 = allow, 0 = deny
    ]
)


def _empty_restrict_pd(with_qid: bool = False) -> pd.DataFrame:
    """Driver-side empty restrict frame for the one-sided kernel dispatch
    (used when no filter and no tombstones exist, so the cogroup's second
    exchange — and its AQE stage-job — can be skipped entirely)."""
    cols = {
        "segment_id": pd.Series(dtype="object"),
        "doc_id": pd.Series(dtype="int64"),
        "flag": pd.Series(dtype="int64"),
    }
    if with_qid:
        cols["qid"] = pd.Series(dtype="int64")
    return pd.DataFrame(cols)


@dataclass
class Query:
    """The knn-clause analog (KNNQueryBuilder.java:64-81)."""

    text: str
    k: int | None = 10
    min_score: float | None = None  # radial / score-threshold mode (Q9)
    filter_expr: str | None = None  # any SQL predicate over repo/path/lang
    overquery_factor: int | None = None  # rescore oversample (Q11)
    # per-field weights (multi-field search): {"content": 1.0, "path": 2.0}.
    # None = primary field only. Every query term scores in every listed
    # field (per-field idf/dl/avgdl), contributions scaled by the weight —
    # the weighted multi-field query analog of the reference's per-field
    # knn_vector mappings (KNNVectorFieldMapper.java:101-177).
    fields: dict | None = None
    # parse flags (KNNQueryBuilder.java:64-81 contract):
    # ignore_unmapped — fields not present in the index mapping contribute
    # no hits instead of raising (all-unmapped query matches nothing);
    # expand_nested — grouped search returns EVERY child of a matched
    # group, not just the best one (consumed by SearchIndex.search_grouped)
    ignore_unmapped: bool = False
    expand_nested: bool = False
    params: dict = field(default_factory=dict)

    def validate(self) -> None:
        if (self.k is None) == (self.min_score is None):
            raise ValueError("exactly one of k | min_score must be set")
        if self.k is not None and not (0 < self.k <= 10_000):
            raise ValueError("k must be in (0, 10000]")
        if self.fields is not None:
            if not self.fields:
                raise ValueError("fields, when given, must be non-empty")
            if any(w <= 0 for w in self.fields.values()):
                raise ValueError("field weights must be > 0")
        if self.overquery_factor is not None and self.overquery_factor < 1:
            raise ValueError("overquery_factor must be >= 1")
        if not isinstance(self.ignore_unmapped, bool):
            raise ValueError("ignore_unmapped must be a bool")
        if not isinstance(self.expand_nested, bool):
            raise ValueError("expand_nested must be a bool")


class SearchIndex:
    """Driver-side handle: metadata, global stats, query execution."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.meta = IndexMeta(index_dir)
        self.config: IndexConfig = self.meta.load_config()
        self.refresh()

    def refresh(self) -> None:
        self.manifests = self.meta.live_manifests()
        self.segments = sorted(self.manifests)
        # tombstones as a DataFrame over the commit log's delete files —
        # deleted ids never enter the driver or the plan as literals
        self._tombstones_df = self.meta.tombstones_df(self.spark)
        # Lucene semantics: deleted docs stay in the collection stats until
        # a compact merge rewrites the segment
        self.num_docs = sum(m["num_docs"] for m in self.manifests.values())
        self.sum_dl = sum(m["sum_dl"] for m in self.manifests.values())
        self.avgdl = (self.sum_dl / self.num_docs) if self.num_docs else 0.0
        # per-field collection stats (multi-field indexes)
        self.index_fields = tuple(getattr(self.config, "fields", ("content",)))
        self.avgdl_fields = {self.index_fields[0]: self.avgdl}
        for f in self.index_fields[1:]:
            s = sum(
                m.get("sum_dl_fields", {}).get(f, 0) for m in self.manifests.values()
            )
            self.avgdl_fields[f] = (s / self.num_docs) if self.num_docs else 0.0
        # reusable union DataFrames (parquet footers/plans resolved once per
        # refresh, shared across queries — the segment-reader cache analog)
        from pysearch.build import BLOCK_SCHEMA

        self._postings_df = self._read_union(
            self.meta.postings_paths, self.segments, schema=BLOCK_SCHEMA
        )
        self._dictionary_df = self._read_union(self.meta.dictionary_paths, self.segments)
        self._docmaps_df = self._read_union(self.meta.docmap_paths, self.segments)
        # small-index fast path: pin global term->df in driver memory (one
        # less Spark job per query). Gated by size — a 10^12-file index has
        # hundreds of millions of terms and stays on the pushdown path.
        # hot-postings cache (the Lucene page-cache / segment-reader-in-RAM
        # analog): small indexes pin the postings union in executor storage,
        # so per-query scans skip file listing + parquet footer work. Gated
        # by size exactly like the identity cache — a 10^12-file index stays
        # on the parquet pushdown path (which tests/test_plan_properties.py
        # guards against the UNCACHED reader below).
        for attr in ("_postings_cached", "_docmaps_cached"):
            prev_hot = getattr(self, attr, None)
            if prev_hot is not None:
                prev_hot.unpersist()
        self._postings_cached = None
        self._docmaps_cached = None
        if 0 < self.num_docs <= self.IDENTITY_CACHE_MAX_DOCS and self._postings_df is not None:
            from pyspark import StorageLevel

            # the no-op filter keeps this a DISTINCT analyzed plan from
            # _postings_df, so Spark's cache manager only substitutes the
            # cache when _postings_source() opts in — the bare parquet union
            # (and its pushdown/pruning plan, which tests guard) stays
            # available for plan inspection and big-index readers.
            # Persisted PRE-PARTITIONED on segment_id: the cached relation's
            # hash partitioning satisfies the kernel groupBy's clustering
            # requirement, so every query served from the cache skips the
            # per-query kernel Exchange outright (guide §2.4 — two
            # operations keyed the same way share one exchange; here the
            # exchange is paid ONCE at refresh). Partition count uses the
            # session's shuffle budget so few-segment indexes still spread
            # kernel groups across cores (hash collisions at N=#segments
            # partitions serialized ~40% of kernel tasks).
            # the cached plan must be compiled NON-adaptively: an AQE-wrapped
            # cached plan reports unknown output partitioning to the outer
            # query, which re-inserts an ENSURE_REQUIREMENTS exchange above
            # every InMemoryTableScan — exactly the shuffle the
            # pre-partitioning exists to remove (verified by plan capture:
            # AQE-persisted cache -> 1 exchange/query, static -> 0).
            # Spark compiles the cache's physical plan eagerly at persist(),
            # so AQE only needs to be off for this call; the save/restore is
            # under the same lock the single-query tuning uses.
            self._postings_cache_parts = self._shuffle_budget()
            with _CONF_LOCK:
                try:
                    saved_aqe = self.spark.conf.get("spark.sql.adaptive.enabled")
                except Exception:
                    saved_aqe = None
                try:
                    self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                    self._postings_cached = (
                        self._postings_df.where(F.lit(True))
                        .repartition(self._postings_cache_parts, "segment_id")
                        .persist(StorageLevel.MEMORY_AND_DISK)
                    )
                    # docmap cache, same gate + same pre-partitioning: the
                    # accept-set side of a FILTERED query then preserves the
                    # cache's hashpartitioning through its filter, the
                    # kernel cogroup sees two co-partitioned children, and
                    # filtered queries run exchange-free like unfiltered
                    # ones (previously: one docmap parquet scan + one
                    # restrict exchange per filtered query)
                    self._docmaps_cached = (
                        self._docmaps_df.where(F.lit(True))
                        .repartition(self._postings_cache_parts, "segment_id")
                        .persist(StorageLevel.MEMORY_AND_DISK)
                    )
                finally:
                    if saved_aqe is not None:
                        self.spark.conf.set(
                            "spark.sql.adaptive.enabled", saved_aqe
                        )
        self._df_cache: dict[str, int] | None = None
        total_terms = sum(m["num_terms"] for m in self.manifests.values())
        if 0 < total_terms <= 2_000_000 and self._dictionary_df is not None:
            rows = (
                self._dictionary_df.groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            self._df_cache = {r["term"]: int(r["df"]) for r in rows}
        # per-term stats memo for BIG dictionaries (the Lucene term-
        # dictionary-cache analog): the index state behind a SearchIndex
        # handle is immutable (handles are keyed by commit count), so a
        # term's global df never changes — repeated terms skip the
        # dictionary-lookup Spark job entirely. Holds NEGATIVE entries too
        # (df=0 for absent terms: OOV queries must not re-scan). Bounded.
        self._term_stats_memo: dict[str, int] = {}
        # same gate for the identity columns: top-k winners resolve to
        # (repo, path, lang, sha) from driver memory instead of a second
        # docmap-join job per query; big indexes stay on the fused-join path
        self._identity_cache: dict[int, tuple] | None = None
        if 0 < self.num_docs <= self.IDENTITY_CACHE_MAX_DOCS and self._docmaps_df is not None:
            # collected from the docmap CACHE when present: materializes it
            # and fetches the identity rows in one job
            rows = (
                self._docmaps_cached
                if self._docmaps_cached is not None
                else self._docmaps_df
            ).select(
                "doc_id", "repo", "path", "lang", "content_sha"
            ).collect()
            self._identity_cache = {
                int(r["doc_id"]): (r["repo"], r["path"], r["lang"], r["content_sha"])
                for r in rows
            }

    MAX_PREFIX_EXPANSIONS = 50  # Lucene MultiTermQuery-style cap
    # per-term df memo bound: ~50 B/entry -> <= ~50 MB driver memory; the
    # memo clears wholesale at the bound (hot terms repopulate in one query)
    TERM_STATS_MEMO_MAX = 1_000_000
    # identity columns pinned driver-side below this doc count (one less
    # Spark action per query); above it, winners resolve via an isin-pruned
    # docmap lookup
    IDENTITY_CACHE_MAX_DOCS = 500_000

    # -- plan helpers --------------------------------------------------------
    def _tokenize_query(self, text: str) -> list[str]:
        """Analyze the query text. A token written with a trailing ``*`` is a
        PREFIX term (the wildcard/MultiTermQuery analog): it expands to every
        dictionary term with that prefix — deterministically the first
        MAX_PREFIX_EXPANSIONS in term order — and each expansion scores as a
        normal BM25 term. Expansion scans the dictionaries of all buckets
        (prefixes don't hash), relying on term-sorted row groups for pruning."""
        fn = tokenize_code_text if self.config.extra.get("code_aware") else tokenize_text
        seen, out = set(), []
        for raw in text.split():
            if raw.endswith("*") and len(raw) > 1:
                toks = fn(raw[:-1])
                if not toks:
                    continue
                # a code-aware analyzer may split the starred token into
                # several subtokens (fooBar* -> [foo, bar*]): the leading
                # subtokens score as normal terms, only the final one expands
                for t in toks[:-1]:
                    if t not in seen:
                        seen.add(t)
                        out.append(t)
                for t in self.expand_prefix(toks[-1]):
                    if t not in seen:
                        seen.add(t)
                        out.append(t)
                continue
            for t in fn(raw):
                if t not in seen:
                    seen.add(t)
                    out.append(t)
        return out

    def _compile_query(self, query: Query, fn) -> dict:
        """Per-query compilation shared by search() and search_batch():
        phrase parse, field validation, term-key expansion into each queried
        field's namespace (the weight scales the field's contributions,
        per-field avgdl feeds the norm)."""
        from pysearch.build import term_key

        rest, phrases = parse_phrases(query.text, fn)
        if phrases and not self.config.store_positions:
            raise ValueError(
                "phrase queries need an index built with store_positions=True"
            )
        primary = self.index_fields[0]
        qfields = query.fields or {primary: 1.0}
        unknown = set(qfields) - set(self.index_fields)
        if unknown:
            if query.ignore_unmapped:
                # unmapped fields contribute no hits (ignore_unmapped=true
                # semantics); a query whose every field is unmapped matches
                # nothing rather than erroring
                qfields = {f: w for f, w in qfields.items() if f not in unknown}
            else:
                raise ValueError(
                    f"query fields {sorted(unknown)} not indexed; index has "
                    f"{list(self.index_fields)}"
                )
        if phrases and primary not in qfields:
            raise ValueError(
                "phrase queries match the primary field; include it in fields"
            )
        base_terms = self._tokenize_query(rest)
        keys: list[str] = []
        weights: dict[str, float] = {}
        avgdl: dict[str, float] = {}
        for f in sorted(qfields):
            for t in base_terms:
                kk = term_key(f, t, primary)
                if kk not in weights:
                    keys.append(kk)
                    weights[kk] = float(qfields[f])
                    avgdl[kk] = self.avgdl_fields[f]
        return {"keys": keys, "weights": weights, "avgdl": avgdl, "phrases": phrases}

    def expand_prefix(self, prefix: str) -> list[str]:
        """All indexed PRIMARY-field terms starting with `prefix`,
        term-ascending, capped. Extra fields' namespaced dictionary entries
        are excluded (a bare prefix must not match '<field>\\x1f...' keys)."""
        from pysearch.build import FIELD_SEP

        if not self.segments:
            return []
        if self._df_cache is not None:
            matches = sorted(
                t
                for t in self._df_cache
                if t.startswith(prefix) and FIELD_SEP not in t
            )
        else:
            rows = (
                self._dictionary_df.where(
                    F.col("term").startswith(prefix)
                    & ~F.col("term").contains(FIELD_SEP)
                )
                .select("term")
                .distinct()
                .orderBy("term")
                .limit(self.MAX_PREFIX_EXPANSIONS)
                .collect()
            )
            matches = [r["term"] for r in rows]
        return matches[: self.MAX_PREFIX_EXPANSIONS]

    def _read_union(
        self, paths_fn, segments: Iterable[str], schema=None
    ) -> DataFrame | None:
        """Union of per-segment data, resolving manifest storage pointers
        (an incrementally-merged segment reads its inputs' directories)."""
        from pysearch.checkpoint import read_parquet_union

        dfs = []
        for s in segments:
            dfs.append(
                read_parquet_union(self.spark, paths_fn(s), schema=schema)
                .withColumn("segment_id", F.lit(s))
            )
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def docmaps(self, segments: Iterable[str] | None = None) -> DataFrame:
        if segments is None:
            return (
                self._docmaps_cached
                if self._docmaps_cached is not None
                else self._docmaps_df
            )
        return self._read_union(self.meta.docmap_paths, segments)

    def global_term_stats(self, terms: list[str]) -> dict[str, int]:
        """Global df per term = Σ per-segment df (segments are doc-disjoint).
        Partition-pruned: only the term buckets of the query are read."""
        if not terms or not self.segments:
            return {}
        if self._df_cache is not None:
            return {t: self._df_cache[t] for t in terms if t in self._df_cache}
        memo = self._term_stats_memo
        missing = sorted({t for t in terms if t not in memo})
        if missing:
            buckets = sorted({bucket_of(t, self.config.term_buckets) for t in missing})
            d = self._dictionary_df
            rows = (
                d.where(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            if len(memo) + len(missing) > self.TERM_STATS_MEMO_MAX:
                memo.clear()
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                memo[t] = found.get(t, 0)  # 0 = negative entry (absent term)
        return {t: memo[t] for t in terms if memo.get(t, 0) > 0}

    def idf(self, df_t: int) -> float:
        return float(np.log(1.0 + (self.num_docs - df_t + 0.5) / (df_t + 0.5)))

    def _shuffle_budget(self) -> int:
        """The session's shuffle-partition budget (cluster-sized conf, local
        default = core count) — the scale-adaptive parallelism ceiling for
        kernel stages."""
        try:
            return max(1, int(self.spark.conf.get("spark.sql.shuffle.partitions")))
        except Exception:
            return 200

    def _kernel_partitions(self) -> int:
        """Partition count for kernel (applyInPandas) stages: one task per
        segment up to the session's shuffle-partition budget. Pinned via an
        explicit repartition so AQE's byte-based coalescing can't serialize
        a CPU-heavy kernel stage whose shuffle happens to be small."""
        return max(1, min(len(self.segments), self._shuffle_budget()))

    def _postings_prepartitioned(self) -> bool:
        """True when _postings_source() serves the refresh-time cache, whose
        persisted plan is already hash-partitioned on segment_id — kernel
        stages then need no per-query repartition (no Exchange at all)."""
        return self._postings_cached is not None

    def _postings_source(self) -> DataFrame:
        """The hot cached union when the size gate admitted it, else the
        parquet union with full pushdown/pruning."""
        return (
            self._postings_cached
            if self._postings_cached is not None
            else self._postings_df
        )

    SINGLE_QUERY_SHUFFLE_PARTITIONS = 4

    def _single_query_confs(self):
        """Latency tuning for the one-query action: AQE materializes each
        shuffle stage as its own job (3 scheduler round-trips measured for a
        query whose kernel shuffle has only #segments groups), and a static
        32-partition shuffle schedules mostly-empty reduce tasks. Both knobs
        are set for the duration of the action and restored after —
        measured p50 0.86s -> 0.64s at sf0.1/local[32]. Batch and table
        paths keep AQE (their shuffles are big enough to benefit).

        Concurrency: session confs are GLOBAL, so the tuning only engages
        under a process-wide try-lock — the first in-flight query tunes and
        restores; overlapping queries in other threads (a server under
        load) run untuned rather than racing the save/restore. Results are
        identical either way; only scheduling differs."""
        from contextlib import contextmanager

        @contextmanager
        def ctx():
            if not _CONF_LOCK.acquire(blocking=False):
                # another search is mid-flight: don't race its conf state
                yield
                return
            spark = self.spark
            want = {"spark.sql.adaptive.enabled": "false"}
            try:
                cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
            except Exception:
                cur = 200
            want["spark.sql.shuffle.partitions"] = str(
                max(
                    self.SINGLE_QUERY_SHUFFLE_PARTITIONS,
                    min(max(len(self.segments), 1), cur),
                )
            )
            saved = {}
            try:
                for k_, v in want.items():
                    try:
                        saved[k_] = spark.conf.get(k_)
                    except Exception:
                        saved[k_] = None
                    spark.conf.set(k_, v)
                yield
            finally:
                # every key that was SET gets restored: set back to the
                # saved value when it was readable, unset otherwise —
                # a session whose conf.get failed must not keep the
                # single-query override (AQE off / shrunken shuffle
                # partitions) leaking into batch/table paths afterwards
                for k_, v in saved.items():
                    try:
                        if v is not None:
                            spark.conf.set(k_, v)
                        else:
                            spark.conf.unset(k_)
                    except Exception as exc:  # pragma: no cover - conf race
                        # a silently-stuck override is the exact leak this
                        # block exists to prevent — make the failure visible
                        import warnings as _warnings

                        _warnings.warn(
                            f"failed to restore Spark conf {k_!r}: {exc}; "
                            "the single-query override may still be active",
                            RuntimeWarning,
                            stacklevel=2,
                        )
                _CONF_LOCK.release()

        return ctx()

    # -- main entry ----------------------------------------------------------
    def search(
        self,
        query: Query | str,
        k: int | None = None,
        with_metrics: bool = False,
    ):
        """Execute a query; returns hits DataFrame
        (doc_id, score, repo, path, lang, content_sha) ordered by
        (score desc, doc_id asc). With with_metrics=True also returns the
        per-segment metrics DataFrame (stats analog, StatNames.java:14-58).
        """
        if isinstance(query, str):
            query = Query(text=query, k=k or 10)
        query.validate()
        with self._single_query_confs():
            return self._search_impl(query, with_metrics)

    def _search_impl(self, query: Query, with_metrics: bool):
        spark = self.spark
        cfg = self.config

        fn = tokenize_code_text if cfg.extra.get("code_aware") else tokenize_text
        compiled = self._compile_query(query, fn)
        keys, weight_map, avgdl_map, phrases = (
            compiled["keys"], compiled["weights"], compiled["avgdl"],
            compiled["phrases"],
        )
        stats = self.global_term_stats(keys)
        empty_hits = spark.createDataFrame([], _hits_out_schema())
        # a phrase containing a zero-hit term can never match
        if any(t not in stats for p in phrases for t in p):
            return (empty_hits, spark.createDataFrame([], _metrics_schema())) if with_metrics else empty_hits
        terms = [t for t in keys if t in stats]  # drop zero-hit terms
        if not terms or not self.segments:
            return (empty_hits, spark.createDataFrame([], _metrics_schema())) if with_metrics else empty_hits

        idf_map = {t: self.idf(stats[t]) * weight_map[t] for t in terms}
        avgdl_map = {t: avgdl_map[t] for t in terms}
        buckets = sorted({bucket_of(t, cfg.term_buckets) for t in terms})

        # bucket partition-pruning + term row-group pruning at the parquet
        # scan (hot indexes serve the same filters from the storage cache)
        postings = self._postings_source().where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if not phrases:
            # column pruning: the positions payload (~half the bytes) is
            # only read when a phrase needs it
            postings = postings.drop("poss")

        restrict = self._restrictions(query)
        seg_docs = {s: self.manifests[s]["num_docs"] for s in self.segments}

        # k mode: per-segment candidates are truncated to k * overquery
        # (clamped) before the global reduce. min_score (radial) mode keeps
        # EVERY candidate >= min_score — a truncation there would silently
        # drop hits from dense segments (the result set is unbounded by
        # contract, exactly like the oracle's WHERE s >= min_score).
        k_final = query.k if query.k is not None else 10_000
        kernel = _segment_search_factory(
            idf_map=idf_map,
            k1=cfg.k1,
            b=cfg.b,
            avgdl_map=avgdl_map,
            k=k_final,
            k_keep=(
                first_pass_k(
                    k_final, query.overquery_factor, len(terms),
                    floor=cfg.overquery_factor,
                )
                if query.min_score is None
                else None
            ),
            min_score=query.min_score,
            filter_present=query.filter_expr is not None,
            seg_docs=seg_docs,
            approximate_threshold=cfg.approximate_threshold,
            bitmap_selectivity=cfg.filter_bitmap_selectivity,
            phrases=phrases,
            filtered_exact_threshold=int(
                query.params.get(
                    "filtered_exact_search_threshold",
                    DEFAULT_FILTERED_EXACT_THRESHOLD,
                )
            ),
        )
        # pin the kernel-stage partition count (see _kernel_partitions: AQE
        # byte-coalescing must not serialize CPU-heavy pandas groups); the
        # pre-partitioned cache already satisfies the groupBy clustering, so
        # cached queries run with ZERO exchanges (one stage end to end)
        n_parts = self._kernel_partitions()
        if self._postings_prepartitioned():
            # the cogroup requires CO-partitioned children: the restrict
            # side must match the cache's partition count or Spark re-adds
            # an exchange on the postings side too
            restrict_parts = self._postings_cache_parts
        else:
            postings = postings.repartition(n_parts, "segment_id")
            restrict_parts = n_parts
        if query.filter_expr is None and self._tombstones_df is None:
            # no accept/deny sets exist: skip the cogroup's second exchange
            # entirely (one fewer AQE stage-job on the latency path — the
            # empty restrict side otherwise still plans+materializes)
            empty_restrict = _empty_restrict_pd()
            candidates = postings.groupBy("segment_id").applyInPandas(
                lambda pdf: kernel(pdf, empty_restrict), schema=HIT_SCHEMA
            )
        else:
            r_side = restrict
            if not (
                self._postings_prepartitioned()
                and self._docmaps_cached is not None
                and self._tombstones_df is None
            ):
                # without both pre-partitioned caches (or with tombstone
                # unions, which lose partitioning) the restrict side needs
                # an explicit co-partitioning exchange
                r_side = restrict.repartition(restrict_parts, "segment_id")
            candidates = (
                postings.groupBy("segment_id")
                .cogroup(r_side.groupBy("segment_id"))
                .applyInPandas(kernel, schema=HIT_SCHEMA)
            )
        if with_metrics:
            # the kernel emits one sentinel row (doc_id = -1) per segment
            # carrying the per-segment counters (stats analog); persist so
            # metrics + hits are served from one execution
            candidates = candidates.persist()
            metrics_rows = (
                candidates.where(F.col("doc_id") == -1)
                .select(
                    "segment_id", "blocks_scanned", "blocks_skipped",
                    F.col("score").cast("int").alias("candidates"), "strategy",
                )
                .collect()
            )
            metrics_df = spark.createDataFrame(metrics_rows, _metrics_schema())
        real = candidates.where(F.col("doc_id") >= 0)

        # rank by score rounded to 1e-9, ties by ascending doc_id: docs whose
        # scores are mathematically equal can differ in the last float ulp
        # depending on summation order (engine vs oracle) — rounding makes the
        # tiebreak deterministic across implementations (Lucene's doc-order
        # tiebreak analog, SURVEY §7.3 hard part (a))
        rank_score = F.round(F.col("score"), 9)
        if query.min_score is not None:
            top = real.where(F.col("score") >= query.min_score)
        else:
            top = real.orderBy(F.desc(rank_score), F.asc("doc_id")).limit(k_final)

        # resolve winners to identity columns. Small indexes: driver-cached
        # docmap — the whole query is ONE Spark action (the second
        # docmap-join job was half the measured single-query latency). Big
        # indexes: the join stays lazy and fused into the same action.
        top = top.select("doc_id", "score")
        if self._identity_cache is not None:
            rows = top.collect()
            cache = self._identity_cache
            data = sorted(
                (
                    (int(r["doc_id"]), float(r["score"]))
                    + cache.get(int(r["doc_id"]), (None, None, None, None))
                    for r in rows
                ),
                key=lambda t: (-round(t[1], 9), t[0]),
            )
            # local result through the ARROW path: createDataFrame on plain
            # tuples builds a pickled PythonRDD whose .collect() round-trips
            # Python workers (~0.2 s for <= k rows); a pandas input becomes
            # JVM-side Arrow batches and collects in ~35 ms
            hits = spark.createDataFrame(
                pd.DataFrame(data, columns=_hits_out_schema().fieldNames()),
                _hits_out_schema(),
            )
        elif query.min_score is None:
            # big index, k mode: collect the tiny top-k (action 1), then an
            # isin-pushdown docmap lookup (action 2) — the id predicate
            # prunes parquet row groups (docmaps are doc_id-range-partitioned
            # and sorted), so the lookup is O(k row groups) at any scale,
            # unlike a full docmap scan fused into one action
            rows = top.collect()
            if not rows:
                hits = spark.createDataFrame([], _hits_out_schema())
            else:
                scores = spark.createDataFrame(
                    [(int(r["doc_id"]), float(r["score"])) for r in rows],
                    "doc_id long, score double",
                )
                dm = self.docmaps().where(
                    F.col("doc_id").isin([int(r["doc_id"]) for r in rows])
                ).select("doc_id", "repo", "path", "lang", "content_sha")
                hits = (
                    dm.join(F.broadcast(scores), "doc_id", "inner")
                    .select("doc_id", "score", "repo", "path", "lang", "content_sha")
                    .orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
                )
        else:
            # big index, radial mode: unbounded result set — keep it lazy
            # and fused, let AQE pick the join strategy
            dm = self.docmaps().select(
                "doc_id", "repo", "path", "lang", "content_sha"
            )
            hits = (
                dm.join(top, "doc_id", "inner")
                .select("doc_id", "score", "repo", "path", "lang", "content_sha")
                .orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
            )
        if with_metrics:
            # materialize before dropping the persisted kernel output (hits
            # are lazy and would otherwise recompute it)
            rows = hits.collect()
            candidates.unpersist()
            hits = spark.createDataFrame(
                pd.DataFrame(
                    [tuple(r) for r in rows],
                    columns=_hits_out_schema().fieldNames(),
                ),
                _hits_out_schema(),
            )
            return hits, metrics_df
        return hits

    def search_grouped(
        self,
        query: Query | str,
        group_col: str = "repo",
        k_groups: int = 3,
        children: DataFrame | None = None,
    ) -> DataFrame:
        """Grouped (nested-field) retrieval: the top `k_groups` groups,
        each scored by its best child (NestedKnnVectorQueryFactory.java:1-77
        parent-from-best-child rule, ties by group ascending).

        With ``query.expand_nested=True`` (KNNQueryBuilder.java:64-81),
        returns EVERY child of each matched group with the group's best
        score attached as `parent_score` (ExpandNestedDocsQuery.java:1-141
        — the reference returns all nested docs of a matched parent, not
        just the winner). Otherwise one row per group winner.

        `children`: optional (group_col, doc_id) DataFrame giving the full
        child population for expansion; defaults to the index docmap."""
        from pysearch.ops import rerank as _rerank

        if isinstance(query, str):
            query = Query(text=query, k=10)
        query.validate()
        hits = self.search(query)
        winners = _rerank.group_top_docs(hits, group_col, 1)
        parents = (
            winners.orderBy(
                F.desc(F.round(F.col("score"), 9)), F.asc(group_col)
            )
            .limit(k_groups)
            .select(group_col, "doc_id", "score")
        )
        if not query.expand_nested:
            return parents
        kids = (
            children
            if children is not None
            else self.docmaps().select(group_col, "doc_id")
        )
        return _rerank.expand_group_docs(parents, kids, group_col)

    def search_batch(self, queries: list[Query]) -> DataFrame:
        """Execute MANY queries as ONE distributed job — the throughput path
        for batch retrieval (offline evaluation, training-data joins). Per
        segment, the kernel runs every query against the already-loaded
        posting blocks; global per-query top-k is a single window. Returns
        (query_id, doc_id, score) with query_id = position in `queries`.

        Scaling: one postings scan for the union of all query terms, one
        cogroup shuffle, one window — cost amortizes across queries, so
        throughput scales with cores/executors (single-query latency is
        driver-bound instead)."""
        spark = self.spark
        cfg = self.config
        out_schema = "query_id long, doc_id long, score double"
        if not self.segments:
            return spark.createDataFrame([], out_schema)

        qinfos = []
        all_terms: list[str] = []
        avgdl_map: dict[str, float] = {}
        fn = tokenize_code_text if cfg.extra.get("code_aware") else tokenize_text
        filter_exprs: list[str | None] = []
        for qid, q in enumerate(queries):
            q.validate()
            compiled = self._compile_query(q, fn)
            avgdl_map.update(compiled["avgdl"])
            filter_exprs.append(q.filter_expr)
            qinfos.append(
                {
                    "qid": qid,
                    "terms": compiled["keys"],
                    "weights": compiled["weights"],
                    "phrases": compiled["phrases"],
                    # min_score (radial) queries are unbounded by contract:
                    # no per-segment or global truncation (mirrors search())
                    "k": q.k if q.k is not None else (1 << 40),
                    "min_score": q.min_score,
                    "has_filter": q.filter_expr is not None,
                    # overquery_factor is irrelevant here: the batch kernel
                    # scores exact TAAT with a tie-inclusive cut, so there is
                    # no first-pass approximation to oversample
                }
            )
            all_terms.extend(t for t in compiled["keys"] if t not in all_terms)

        stats = self.global_term_stats(all_terms)
        return self._execute_batch(qinfos, filter_exprs, stats, avgdl_map)

    def _execute_batch(
        self,
        qinfos: list[dict],
        filter_exprs: list[str | None],
        stats: dict[str, int],
        avgdl_map: dict[str, float],
        ordered: bool = True,
    ) -> DataFrame:
        """Shared batch execution: compiled per-query infos -> one postings
        scan for the union of terms -> one cogrouped kernel pass -> one
        global window. Used by search_batch (driver-compiled Query objects)
        and search_batch_table (table-compiled queries)."""
        spark = self.spark
        cfg = self.config
        out_schema = "query_id long, doc_id long, score double"
        live_terms_set = set()
        any_phrases = False
        for info in qinfos:
            # a phrase with a zero-hit term kills the whole query
            if any(t not in stats for p in info["phrases"] for t in p):
                info["terms"] = []
            info["terms"] = [t for t in info["terms"] if t in stats]
            info["idf"] = {
                t: self.idf(stats[t]) * info["weights"][t] for t in info["terms"]
            }
            live_terms_set.update(info["terms"])
            any_phrases = any_phrases or bool(info["phrases"] and info["terms"])
        live_terms = sorted(live_terms_set)
        if not live_terms:
            return spark.createDataFrame([], out_schema)

        buckets = sorted({bucket_of(t, cfg.term_buckets) for t in live_terms})
        postings = self._postings_source().where(F.col("bucket").isin(buckets))
        if len(live_terms) <= 512:
            # small vocabularies ride the plan as literals so the In(term,..)
            # predicate reaches parquet row groups
            postings = postings.where(F.col("term").isin(live_terms))
        else:
            # a 10^4+-term chunk vocabulary as literals bloats analysis and
            # codegen (the k-map failure mode) — semi-join a tiny broadcast
            # terms table instead; bucket partition pruning still applies
            terms_df = spark.createDataFrame(
                [(t,) for t in live_terms], "term string"
            )
            postings = postings.join(F.broadcast(terms_df), "term", "left_semi")
        if not any_phrases:
            # positions payload pruned whenever no query needs the phrase tier
            postings = postings.drop("poss")

        # per-query accept sets (+ shared tombstones under qid = -1)
        parts = []
        filtered = [
            (info["qid"], expr)
            for info, expr in zip(qinfos, filter_exprs)
            if expr is not None
        ]
        if filtered:
            # real query tables repeat a few DISTINCT predicates across many
            # rows (per-language, per-repo, ...) — dedupe them so the plan
            # holds O(distinct filters) expressions, not O(filtered rows):
            # one pushdown-pruned docmap branch per distinct predicate, each
            # exploding its member-qid list (the qid lists are data, not
            # expression nodes). A chunk of 10^4 rows sharing 3 filters
            # compiles 3 branches. Only a chunk of ALL-DISTINCT predicates
            # falls back to the one-pass when-array (bounded by chunk size).
            by_expr: dict[str, list[int]] = {}
            for qid, expr in filtered:
                by_expr.setdefault(expr, []).append(qid)
            if len(by_expr) <= 64:
                for expr, qids in by_expr.items():
                    # member qids ride as a tiny broadcast TABLE (data, not
                    # literal expression nodes — 10^4 rows sharing a filter
                    # add zero plan nodes)
                    qdf = spark.createDataFrame(
                        [(int(q),) for q in qids], "qid int"
                    )
                    parts.append(
                        self.docmaps()
                        .where(F.expr(expr))
                        .select(
                            "segment_id", "doc_id", F.lit(1).alias("flag")
                        )
                        .crossJoin(F.broadcast(qdf))
                    )
            else:
                matches = F.array_compact(
                    F.array(
                        *[
                            F.when(F.expr(expr), F.lit(qid)).otherwise(F.lit(None))
                            for qid, expr in filtered
                        ]
                    )
                )
                parts.append(
                    self.docmaps()
                    .select(
                        "segment_id", "doc_id", F.lit(1).alias("flag"),
                        F.explode(matches).alias("qid"),
                    )
                )
        deny = self._tombstone_deny()
        if deny is not None:
            parts.append(deny.withColumn("qid", F.lit(-1)))
        restrict_schema = T.StructType(
            _RESTRICT_SCHEMA.fields + [T.StructField("qid", T.IntegerType())]
        )
        restrict = parts[0] if parts else spark.createDataFrame([], restrict_schema)
        for p in parts[1:]:
            restrict = restrict.unionByName(p)

        cand_schema = T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        # EXPLICIT partition count for the kernel stage: the shuffled block
        # bytes are tiny (KBs per segment) but the per-group kernel is
        # CPU-heavy (decode + 10^4-query TAAT), so AQE's byte-based
        # coalescing would merge the whole stage into ONE task and run
        # segments serially (measured 115 s -> ~15 s on a 32-segment
        # index). A user-specified repartition pins the count — AQE honors
        # it — and the groupBy reuses the exchange (same hash key).
        #
        # QUERY-GROUP salting (guide §2.5 — synthetic keys for idle-core
        # skew): a big query chunk against a FEW-segment index would run the
        # whole TAAT pass in #segments tasks, leaving most cores idle. The
        # postings (small, compressed blocks) are replicated across `qgroups`
        # sub-keys and each (segment, group) task scores only the queries
        # with qid % qgroups == group — per-query work unchanged, decode
        # re-paid qgroups times (cheap vs scoring), kernel parallelism
        # #segments * qgroups. Scale-adaptive: derived from the session's
        # shuffle budget, so a many-segment index (budget <= #segments)
        # keeps qgroups == 1 and replicates nothing.
        n_parts = self._kernel_partitions()
        # >= 256 queries per group: below that the kernel stage is cheap
        # enough that the replication exchange costs more than the extra
        # parallelism buys (measured: 100-query batch 2.98s -> 3.78s salted,
        # 10k-query table 10.2s -> 3.8s salted)
        qgroups = max(
            1,
            min(
                self._shuffle_budget() // max(n_parts, 1),
                -(-len(qinfos) // 256),
            ),
        )
        kernel = _batch_search_factory(qinfos, cfg.k1, cfg.b, avgdl_map, qgroups)
        if qgroups > 1:
            garr = F.array(*[F.lit(i) for i in range(qgroups)])
            postings = postings.withColumn("_qg", F.explode(garr)).repartition(
                n_parts * qgroups, "segment_id", "_qg"
            )
            grouped = postings.groupBy("segment_id", "_qg")
        else:
            if not self._postings_prepartitioned():
                postings = postings.repartition(n_parts, "segment_id")
            grouped = postings.groupBy("segment_id")
        if not parts:
            # no filters and no tombstones in the whole chunk: one-sided
            # dispatch, no second exchange
            empty_restrict = _empty_restrict_pd(with_qid=True)
            cands = grouped.applyInPandas(
                lambda pdf: kernel(pdf, empty_restrict), schema=cand_schema
            )
        else:
            if qgroups > 1:
                # per-query accept rows route to their query's group; shared
                # tombstone rows (qid = -1) must reach every group
                filt_r = restrict.where(F.col("qid") >= 0).withColumn(
                    "_qg", F.pmod(F.col("qid"), F.lit(qgroups)).cast("int")
                )
                tomb_r = restrict.where(F.col("qid") < 0).withColumn(
                    "_qg", F.explode(garr)
                )
                restrict_g = filt_r.unionByName(tomb_r).repartition(
                    n_parts * qgroups, "segment_id", "_qg"
                )
                cands = grouped.cogroup(
                    restrict_g.groupBy("segment_id", "_qg")
                ).applyInPandas(kernel, schema=cand_schema)
            else:
                # co-partition the restrict side with the postings side
                # (cache partition count when the cache serves the scan) so
                # the cogroup adds no exchange above the cached postings
                r_parts = (
                    self._postings_cache_parts
                    if self._postings_prepartitioned()
                    else n_parts
                )
                cands = grouped.cogroup(
                    restrict.repartition(r_parts, "segment_id")
                    .groupBy("segment_id")
                ).applyInPandas(kernel, schema=cand_schema)
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")
        )
        ranked = cands.withColumn("rk", F.row_number().over(w))
        if len(qinfos) <= 64:
            kmap = F.create_map(
                *[x for info in qinfos for x in (F.lit(info["qid"]), F.lit(info["k"]))]
            )
            ranked = ranked.where(F.col("rk") <= kmap[F.col("query_id")])
        else:
            # thousands of queries: a 2N-literal map expression bloats the
            # plan and codegen — broadcast-join the tiny (qid, k) table
            # (built via Arrow, not row-serialized tuples)
            import pandas as _pd

            k_df = spark.createDataFrame(
                _pd.DataFrame(
                    {
                        "query_id": np.fromiter(
                            (i["qid"] for i in qinfos), np.int64, len(qinfos)
                        ),
                        "_qk": np.fromiter(
                            (i["k"] for i in qinfos), np.int64, len(qinfos)
                        ),
                    }
                ),
                "query_id long, _qk long",
            )
            ranked = ranked.join(F.broadcast(k_df), "query_id").where(
                F.col("rk") <= F.col("_qk")
            )
        # no driver-side min_score post-filter: the batch kernel applies each
        # radial row's threshold EXACTLY (TAAT scores are complete per
        # segment and docs live in one segment), and a per-query AND chain
        # here would grow the Catalyst expression tree linearly with the
        # radial-row count (plan/codegen blowup at 10^4+ rows per chunk)
        if ordered:
            return (
                ranked.select("query_id", "doc_id", "score", "rk")
                .orderBy("query_id", "rk")
                .drop("rk")
            )
        return ranked.select("query_id", "doc_id", "score")

    def search_batch_table(
        self,
        queries_df: DataFrame,
        id_col: str = "query_id",
        text_col: str = "text",
        k_col: str | None = None,
        filter_col: str | None = None,
        min_score_col: str | None = None,
        fields_col: str | None = None,
        default_k: int = 10,
        chunk: int = 10_000,
    ) -> DataFrame:
        """Batch retrieval driven by a QUERY TABLE — the offline-evaluation /
        training-data-join surface: one row per query (id, text, optional k,
        filter, min_score and fields columns), returns (query_id, doc_id,
        score) for all of them. A non-null `min_score` cell switches that
        row to RADIAL mode (every hit at/above the threshold, unbounded — k
        ignored), the same k-xor-min_score contract as Query. A non-null
        `fields` cell (JSON object {"field": weight}) runs that row as a
        weighted MULTI-FIELD query like Query.fields — field expansion
        happens inside the distributed compile pass; prefix (*) terms are
        not supported on fielded rows.

        Scaling (the 10^6-10^7-query regime): query ANALYSIS is distributed —
        tokenization + phrase parsing run in one Arrow pass over the table
        (query texts never reach the driver; only the compact compiled form
        — term keys, k, filter — is collected), and term statistics resolve
        in ONE dictionary join for the whole table's distinct vocabulary
        (bounded by vocabulary size, not query count), instead of one
        dictionary job per chunk. Chunking remains only for kernel dispatch:
        each `chunk` queries are ONE distributed job, and per-chunk results
        combine through a balanced union (log-depth lineage)."""
        import json as _json

        id_field = queries_df.schema[id_col]
        cfg = self.config
        code_aware = bool(cfg.extra.get("code_aware"))
        k_expr = (
            F.coalesce(F.col(k_col).cast("int"), F.lit(default_k))
            if k_col
            else F.lit(default_k)
        )
        norm = queries_df.select(
            F.col(id_col).alias("_qid"),
            F.col(text_col).alias("_text"),
            k_expr.alias("_k"),
            (F.col(filter_col) if filter_col else F.lit(None).cast("string")).alias(
                "_f"
            ),
            (
                F.col(min_score_col).cast("double")
                if min_score_col
                else F.lit(None).cast("double")
            ).alias("_ms"),
            (F.col(fields_col) if fields_col else F.lit(None).cast("string")).alias(
                "_fl"
            ),
        )

        compile_schema = T.StructType(
            [
                T.StructField("_qid", id_field.dataType),
                T.StructField("_terms", T.ArrayType(T.StringType())),
                T.StructField("_weights", T.ArrayType(T.DoubleType())),
                T.StructField("_phrases", T.StringType()),
                T.StructField("_k", T.IntegerType()),
                T.StructField("_f", T.StringType()),
                T.StructField("_ms", T.DoubleType()),
            ]
        )
        index_fields = tuple(self.index_fields)
        primary_field = index_fields[0]

        def compile_factory(code_aware_: bool):
            def compile_part(batches):
                from pysearch.analyze import tokenize_code_text, tokenize_text
                from pysearch.build import term_key
                from pysearch.query import parse_phrases

                fn = tokenize_code_text if code_aware_ else tokenize_text
                for pdf in batches:
                    terms_out, weights_out, phrases_out = [], [], []
                    for txt, fl in zip(pdf["_text"], pdf["_fl"]):
                        rest, phrases = parse_phrases(txt or "", fn)
                        seen, toks = set(), []
                        for raw in rest.split():
                            if raw.endswith("*") and len(raw) > 1:
                                if fl is not None:
                                    raise ValueError(
                                        "prefix (*) terms are not supported "
                                        "on fielded query-table rows"
                                    )
                                base = fn(raw[:-1])
                                if not base:
                                    continue
                                # leading subtokens score normally; the final
                                # one stays a marked prefix for expansion
                                cand = base[:-1] + [base[-1] + "*"]
                            else:
                                cand = fn(raw)
                            for t in cand:
                                if t not in seen:
                                    seen.add(t)
                                    toks.append(t)
                        if fl is not None:
                            # field expansion IN the distributed pass — the
                            # per-field term-key namespacing Query.fields does
                            qf = _json.loads(fl)
                            unknown = set(qf) - set(index_fields)
                            if unknown or not qf:
                                raise ValueError(
                                    f"query fields {sorted(unknown)} not in "
                                    f"index fields {list(index_fields)}"
                                )
                            if phrases and primary_field not in qf:
                                raise ValueError(
                                    "phrase queries match the primary field; "
                                    "include it in fields"
                                )
                            keys, ws = [], []
                            for f_ in sorted(qf):
                                for t in toks:
                                    kk = term_key(f_, t, primary_field)
                                    if kk not in keys:
                                        keys.append(kk)
                                        ws.append(float(qf[f_]))
                            terms_out.append(keys)
                            weights_out.append(ws)
                        else:
                            terms_out.append(toks)
                            weights_out.append([1.0] * len(toks))
                        phrases_out.append(_json.dumps(phrases))
                    out = pdf[["_qid", "_k", "_f", "_ms"]].copy()
                    out["_terms"] = terms_out
                    out["_weights"] = weights_out
                    out["_phrases"] = phrases_out
                    yield out[
                        ["_qid", "_terms", "_weights", "_phrases", "_k", "_f", "_ms"]
                    ]

            return compile_part

        # persisted: the compile output feeds up to three actions (prefix
        # collect, dictionary-stats join, compiled-row collect) — without the
        # persist each would re-run the tokenize pass over the whole table
        compiled_df = norm.mapInPandas(
            compile_factory(code_aware), compile_schema
        ).persist()

        # ONE distributed job resolves term stats for the whole table:
        # distinct vocabulary (plus driver-expanded prefixes, which are rare
        # and tiny) joined against the dictionary — cost is O(vocabulary),
        # independent of the query count
        vocab = compiled_df.select(F.explode("_terms").alias("term")).distinct()
        plain = vocab.where(~F.col("term").endswith("*"))
        prefixes = [r["term"][:-1] for r in vocab.where(F.col("term").endswith("*")).collect()]
        prefix_expansions = {p: self.expand_prefix(p) for p in set(prefixes)}
        if self._df_cache is not None:
            stats = dict(self._df_cache)
        else:
            expanded = sorted({t for ts in prefix_expansions.values() for t in ts})
            terms_side = plain
            if expanded:
                terms_side = terms_side.unionByName(
                    self.spark.createDataFrame([(t,) for t in expanded], "term string")
                ).distinct()
            rows = (
                self._dictionary_df.join(F.broadcast(terms_side), "term", "left_semi")
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            stats = {r["term"]: int(r["df"]) for r in rows}

        # STREAMED dispatch: chunk membership is assigned DISTRIBUTED
        # (hash(qid) mod n_chunks over the cached compile output) and the
        # driver collects ONE chunk of compact compiled rows at a time —
        # peak driver memory is O(chunk), not O(query count), at the
        # 10^6-10^7-query regime (neither the texts NOR the full compiled
        # table ever sit on the driver; `last_batch_table_stats` records the
        # observed peak and is guarded in tests/test_batch_table_scale.py)
        n_queries = compiled_df.count()
        n_chunks = max(1, -(-n_queries // chunk))
        chunk_cache = None
        if n_chunks == 1:
            # single-chunk fast path (the common interactive / ≤chunk-size
            # regime): everything fits the one chunk the driver is allowed
            # to hold, so skip the chunk-column projection and its extra
            # cache scan entirely — one collect, zero added machinery
            chunked = None
        else:
            chunked = compiled_df.withColumn(
                "_chunk",
                F.pmod(
                    F.xxhash64(F.col("_qid").cast("string")), F.lit(n_chunks)
                ).cast("int"),
            )
            if n_chunks > 8:
                # cluster the cache BY chunk: each per-chunk collect then
                # prunes to its own cached batches via in-memory column
                # stats instead of rescanning all N compiled rows n_chunks
                # times (O(N) total scan work across the loop, not
                # O(n_chunks * N)); one distributed shuffle pays for it
                chunk_cache = chunked.repartition(n_chunks, "_chunk").persist()
                chunk_cache.count()  # materialize, then release compile cache
                compiled_df.unpersist()
                chunked = chunk_cache
        id_map_schema = T.StructType(
            [
                T.StructField("q_pos", T.LongType()),
                T.StructField("query_id", id_field.dataType),  # caller's id type
            ]
        )
        outs: list[DataFrame] = []
        max_chunk_rows = 0
        # phrase JSON memoization: real tables repeat "[]" (and a few phrase
        # shapes) across most rows — one parse per DISTINCT string, shared
        # read-only by the qinfos. Scoped PER CHUNK (reset below) so driver
        # memory stays O(chunk) even at 10^6+ distinct phrase shapes; the
        # repetition the cache exploits is within-chunk anyway.
        ph_cache: dict[str, list] = {}

        def _load_phrases(s: str) -> list:
            hit = ph_cache.get(s)
            if hit is None:
                hit = ph_cache[s] = _json.loads(s)
            return hit

        import pandas as _pd

        for c in range(n_chunks):
            ph_cache.clear()
            src = (
                compiled_df
                if chunked is None
                else chunked.where(F.col("_chunk") == c).drop("_chunk")
            )
            # Arrow transfer (toPandas), not Row-based collect: the driver's
            # per-chunk prep is SERIAL work that Amdahl-caps query-path
            # scaling — at 100k queries the Row path spent ~0.2 ms/query in
            # deserialization + per-field dict lookups before any kernel ran
            part = src.toPandas()
            n_rows = len(part)
            if not n_rows:
                continue
            max_chunk_rows = max(max_chunk_rows, n_rows)
            qids_v = part["_qid"].tolist()
            terms_v = part["_terms"].tolist()
            weights_v = part["_weights"].tolist()
            phrases_v = part["_phrases"].tolist()
            k_v = part["_k"].tolist()
            f_v = [None if f is None else str(f) for f in part["_f"].tolist()]
            # nulls arrive as NaN through Arrow — normalize to None
            ms_v = [None if _pd.isna(m) else float(m) for m in part["_ms"].tolist()]
            qinfos, filter_exprs = [], []
            for i in range(n_rows):
                radial = ms_v[i] is not None
                if not radial and not (0 < int(k_v[i]) <= 10_000):
                    # same contract as Query.validate(): surface the caller's
                    # bad k instead of silently returning zero hits
                    raise ValueError(
                        f"query {qids_v[i]!r}: k must be in (0, 10000], got {k_v[i]}"
                    )
                terms: list[str] = []
                weights: dict[str, float] = {}
                for t, w in zip(terms_v[i], weights_v[i]):
                    if t.endswith("*") and len(t) > 1:
                        for x in prefix_expansions.get(t[:-1], ()):
                            if x not in weights:
                                terms.append(x)
                                weights[x] = 1.0
                    elif t not in weights:
                        terms.append(t)
                        weights[t] = float(w)
                phrases = _load_phrases(phrases_v[i])
                if phrases and not cfg.store_positions:
                    raise ValueError(
                        "phrase queries need an index built with store_positions=True"
                    )
                qinfos.append(
                    {
                        "qid": i,
                        "terms": terms,
                        "weights": weights,
                        "phrases": phrases,
                        # radial rows are unbounded by contract (mirrors
                        # Query's k-xor-min_score)
                        "k": (1 << 40) if radial else int(k_v[i]),
                        "min_score": ms_v[i],
                        "has_filter": f_v[i] is not None,
                    }
                )
                filter_exprs.append(f_v[i])
            # per-key avgdl: the field is recoverable from the term-key
            # namespace prefix (primary-field keys carry no separator)
            from pysearch.build import FIELD_SEP

            avgdl_map = {
                t: self.avgdl_fields[
                    t.split(FIELD_SEP, 1)[0] if FIELD_SEP in t else self.index_fields[0]
                ]
                for info in qinfos
                for t in info["terms"]
            }
            res = self._execute_batch(
                qinfos, filter_exprs, stats, avgdl_map, ordered=False
            )
            # id_map through the Arrow path too (a 25k-row list-of-tuples
            # createDataFrame serializes row by row)
            id_map = self.spark.createDataFrame(
                _pd.DataFrame(
                    {
                        "q_pos": np.arange(n_rows, dtype=np.int64),
                        "query_id": qids_v,
                    }
                ),
                id_map_schema,
            )
            outs.append(
                res.withColumnRenamed("query_id", "q_pos")
                .join(F.broadcast(id_map), "q_pos")
                .select("query_id", "doc_id", "score")
            )
        (chunk_cache if chunk_cache is not None else compiled_df).unpersist()
        # observability + test guard: the driver never held more than one
        # chunk of compiled rows at a time
        self.last_batch_table_stats = {
            "n_queries": int(n_queries),
            "n_chunks": int(n_chunks),
            "max_chunk_rows": int(max_chunk_rows),
        }
        if not outs:
            empty_schema = T.StructType(
                [
                    T.StructField("query_id", id_field.dataType),
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            )
            return self.spark.createDataFrame([], empty_schema)
        # balanced union: log-depth lineage instead of a linear chain
        while len(outs) > 1:
            outs = [
                outs[i].unionByName(outs[i + 1]) if i + 1 < len(outs) else outs[i]
                for i in range(0, len(outs), 2)
            ]
        return outs[0]

    def _tombstone_deny(self) -> DataFrame | None:
        """Per-segment deny rows from the delete files. Routing uses the
        manifest id RANGES (segments own disjoint doc_id ranges), so no
        docmap scan is needed: each dead id joins to every live segment
        whose [min, max] covers it — over-delivery to a range-overlapping
        merged segment is harmless (a deny id absent from the segment masks
        nothing) and the ranges table is a tiny broadcast."""
        if self._tombstones_df is None:
            return None
        ranges = [
            (s, int(m["doc_id_min"]), int(m["doc_id_max"]))
            for s, m in self.manifests.items()
            if m["num_docs"]
        ]
        if not ranges:
            return None
        rng = self.spark.createDataFrame(ranges, "segment_id string, lo long, hi long")
        return self._tombstones_df.join(
            F.broadcast(rng),
            (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") <= F.col("hi")),
        ).select("segment_id", "doc_id", F.lit(0).alias("flag"))

    def _restrictions(self, query: Query) -> DataFrame:
        """Compile filter + tombstones to per-segment accept/deny doc sets —
        the accept-bits pushdown (Q5). Distributed end to end: the sets ride
        the cogroup, never the driver."""
        spark = self.spark
        parts = []
        if query.filter_expr is not None:
            dm = self.docmaps().where(query.filter_expr)
            parts.append(
                dm.select("segment_id", "doc_id", F.lit(1).alias("flag"))
            )
        deny = self._tombstone_deny()
        if deny is not None:
            parts.append(deny)
        if not parts:
            return spark.createDataFrame([], _RESTRICT_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def reconstruct_source(
        self,
        hits: DataFrame,
        corpus: DataFrame,
        snippet_chars: int | None = None,
        verify_sha: bool = True,
    ) -> DataFrame:
        """Derived-source read-back (KNN10010DerivedSourceStoredFieldsWriter
        analog): the index stores identity + sha256 only, never content —
        this joins hits back to the source-of-truth ``repo_files`` table,
        re-attaching ``content`` (and an optional leading snippet) and
        flagging rows whose stored sha no longer matches the source
        (``sha_ok`` false = the source mutated since indexing).

        The hit side is tiny (top-k), so it broadcasts into the corpus scan
        — one pass over the source table, no shuffle."""
        src = corpus.select(
            "repo", "path", F.col("content"),
            F.sha2("content", 256).alias("_src_sha"),
        )
        out = src.join(F.broadcast(hits), ["repo", "path"], "inner")
        if verify_sha:
            out = out.withColumn("sha_ok", F.col("content_sha") == F.col("_src_sha"))
        if snippet_chars is not None:
            out = out.withColumn("snippet", F.substring("content", 1, snippet_chars))
        cols = ["doc_id", "score", "repo", "path", "lang", "content_sha", "content"]
        if verify_sha:
            cols.append("sha_ok")
        if snippet_chars is not None:
            cols.append("snippet")
        return out.select(*cols).orderBy(
            F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")
        )


def _hits_out_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content_sha", T.StringType()),
        ]
    )


def _metrics_schema():
    return T.StructType(
        [
            T.StructField("segment_id", T.StringType()),
            T.StructField("blocks_scanned", T.IntegerType()),
            T.StructField("blocks_skipped", T.IntegerType()),
            T.StructField("candidates", T.IntegerType()),
            T.StructField("strategy", T.StringType()),
        ]
    )


# dense-accumulator range guard for the batch kernel: segments whose doc-id
# range exceeds max(4x live postings, this cap) fall back to the sort path
# (a merged segment can own a sparse range after deletes/remaps). Module
# constant so tests can force either path and assert rank identity on both.
_DENSE_RANGE_CAP = 1 << 21


def _batch_search_factory(qinfos, k1, b, avgdl_map, qgroups: int = 1):
    """Batch kernel: queries AMORTIZE decode work. Each term's posting list
    is decoded ONCE per segment (not once per query) and its tf-norm —
    tf / (tf + k1*(1-b+b*dl/avgdl)) — is query-independent, so it is cached
    too; a query then scores TAAT in pure numpy: concatenate its terms'
    (ids, idf*tfnorm) arrays and sum per doc (unique + bincount). Exact BM25,
    rank-identical to the single-query block-max path (which stays the
    latency-optimal choice when nothing amortizes)."""
    # captured BY VALUE at factory time (driver-side): the kernel closure is
    # pickled to python workers, where a module-global would re-import fresh
    # — this is what lets tests pin the cap to force either scoring path
    dense_cap = _DENSE_RANGE_CAP

    def kernel(blocks: pd.DataFrame, restrict: pd.DataFrame) -> pd.DataFrame:
        from pysearch.codec import decode_blocks_batch

        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            }
        )
        if len(blocks) == 0:
            return empty
        # query-group salting: this (segment, group) task scores ONLY the
        # queries routed to its group — per-query work identical to the
        # unsalted kernel, just spread across more tasks
        if qgroups > 1:
            g = int(blocks["_qg"].iloc[0])
            infos = [i for i in qinfos if i["qid"] % qgroups == g]
        else:
            infos = qinfos
        deny = None
        if len(restrict):
            d = restrict.loc[restrict["flag"] == 0, "doc_id"].to_numpy(np.int64)
            deny = np.unique(d) if d.size else None
        outs = []
        # pre-group the segment's blocks by term ONCE; per-query views
        # assemble from the dict — O(selected rows) per query instead of an
        # O(all rows) isin scan per query (dominant at 10^3+ queries/chunk)
        term_groups = {t: g for t, g in blocks.groupby("term", sort=False)}
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def decoded_term(t: str) -> tuple[np.ndarray, np.ndarray]:
            hit = decoded.get(t)
            if hit is None:
                g = term_groups[t].sort_values("first_id", kind="mergesort")
                ids, tfs, dls = decode_blocks_batch(
                    g["first_id"].to_numpy(np.int64),
                    g["last_id"].to_numpy(np.int64),
                    g["n"].to_numpy(np.int64),
                    list(g["ids"]),
                    list(g["tfs"]),
                    list(g["dls"]),
                    g["codec"].to_numpy(np.int64),
                )
                tfs = tfs.astype(np.float64)
                dls = dls.astype(np.float64)
                avgdl = avgdl_map[t]
                tfn = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
                if deny is not None:
                    keep = ~_member(ids, deny)
                    ids, tfn = ids[keep], tfn[keep]
                hit = decoded[t] = (ids, tfn)
            return hit

        for info in infos:
            terms = [t for t in info["terms"] if t in term_groups]
            if not terms:
                continue
            allow = None
            if info["has_filter"]:
                a = restrict.loc[
                    (restrict["flag"] == 1) & (restrict["qid"] == info["qid"]),
                    "doc_id",
                ].to_numpy(np.int64)
                if not a.size:
                    continue
                allow = np.unique(a)
            if info["phrases"]:
                # positions-tier adjacency filter inside the batch kernel —
                # same vectorized matcher as the single-query path
                gs = [term_groups[t] for t in terms]
                qblocks = gs[0] if len(gs) == 1 else pd.concat(gs)
                pa = _phrase_allowed(qblocks, info["phrases"])
                if pa.size == 0:
                    continue
                allow = pa if allow is None else np.intersect1d(allow, pa)
                if allow.size == 0:
                    continue
            parts_i, parts_s = [], []
            for t in terms:
                ids, tfn = decoded_term(t)
                if ids.size:
                    parts_i.append(ids)
                    parts_s.append(tfn * info["idf"][t])
            if not parts_i:
                continue
            ids_all = np.concatenate(parts_i)
            sc_all = np.concatenate(parts_s)
            # dense-range accumulation: segments own disjoint doc-id ranges,
            # so a per-query float accumulator over [lo, hi] turns the
            # O(P log P) comparison sort (np.unique over multi-MB int64
            # arrays) into an O(P) cache-resident scatter-add. Measured 2.4x
            # faster at 25k-row segments and 3.5x at 500k-posting hot terms
            # — and it parallelizes better (0.92 vs 0.76 8-way efficiency at
            # cache-resident sizes): the sort's working set is the full
            # concatenated array, the accumulator is one segment range.
            # Accumulation ORDER is identical to bincount-over-inverse
            # (both walk the input sequentially), so sums are bit-identical
            # and rank identity is preserved. Sparse guard: a merged
            # segment's range can exceed its live postings (holes from
            # deletes/remaps); past 4x postings or 2^21 slots the sort path
            # is the better memory citizen.
            lo = min(int(p[0]) for p in parts_i)  # per-term ids are sorted
            hi = max(int(p[-1]) for p in parts_i)
            rng_size = hi - lo + 1
            # dense_cap < 0 disables the dense path outright (test hook)
            if dense_cap >= 0 and rng_size <= max(4 * ids_all.size, dense_cap):
                rel = ids_all - lo
                acc = np.bincount(rel, weights=sc_all, minlength=rng_size)
                if all(v > 0.0 for v in info["idf"].values()):
                    nz = np.flatnonzero(acc)
                else:
                    # a zero query-time field weight can leave a matched doc
                    # at score 0.0 — parity with the sort path (which keeps
                    # it) needs a presence pass, not a nonzero-score test.
                    # Boolean scatter, not a second bincount: one byte/slot
                    # and no float adds, so the non-positive-idf branch costs
                    # ~half the scatter work of the weighted pass
                    present = np.zeros(rng_size, dtype=bool)
                    present[rel] = True
                    nz = np.flatnonzero(present)
                ids = nz + lo
                scores = acc[nz]
            else:
                ids, inv = np.unique(ids_all, return_inverse=True)
                scores = np.bincount(inv, weights=sc_all)
            if allow is not None:
                keep = _member(ids, allow)
                ids, scores = ids[keep], scores[keep]
            if not ids.size:
                continue
            if info["min_score"] is not None:
                keep = scores >= info["min_score"]
                ids, scores = ids[keep], scores[keep]
                order = np.lexsort((ids, -scores))
            else:
                # per-segment cut: TAAT scores are COMPLETE within the
                # segment and docs live in exactly one segment, so keeping
                # every doc at-or-above the k-th best ROUNDED score (+1
                # quantum of slack for round-boundary float disagreement
                # with the JVM) is a provable superset of the global top-k —
                # ~k rows per query instead of the single-path 100-row
                # rescore floor (the window input shrinks 10-30x)
                if scores.size > info["k"]:
                    r = np.floor(scores * 1e9 + 0.5)
                    kth = np.partition(r, r.size - info["k"])[r.size - info["k"]]
                    keep = r >= kth - 1.0
                    ids, scores = ids[keep], scores[keep]
                order = np.lexsort((ids, -scores))
            # raw numpy triples; ONE frame is built at the end (a pandas
            # frame per query costs more than the scoring at 10^3+ queries)
            outs.append(
                (np.full(order.size, info["qid"], np.int64), ids[order], scores[order])
            )
        if not outs:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate([o[0] for o in outs]),
                "doc_id": np.concatenate([o[1] for o in outs]),
                "score": np.concatenate([o[2] for o in outs]),
            }
        )

    return kernel


# ---------------------------------------------------------------------------
# the per-segment kernel (runs inside a cogrouped Arrow UDF)
# ---------------------------------------------------------------------------

def _segment_search_factory(
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl_map: dict[str, float],
    k: int,
    k_keep: int | None,
    min_score: float | None,
    filter_present: bool,
    seg_docs: dict[str, int],
    approximate_threshold: int,
    bitmap_selectivity: float,
    phrases: list[list[str]] | None = None,
    filtered_exact_threshold: int = DEFAULT_FILTERED_EXACT_THRESHOLD,
):
    phrases = phrases or []

    def kernel(blocks: pd.DataFrame, restrict: pd.DataFrame) -> pd.DataFrame:
        if len(blocks) == 0:
            return _empty_hits()
        seg = blocks["segment_id"].iloc[0]
        allow, deny = _restriction_sets(restrict, filter_present, bitmap_selectivity)
        if filter_present and allow is None:
            # filter matched nothing in this segment
            return _empty_hits()
        if phrases:
            pa = _phrase_allowed(blocks, phrases)
            if pa.size == 0:
                return _empty_hits()
            allow = pa if allow is None else np.intersect1d(allow, pa)
            if allow.size == 0:
                return _empty_hits()

        # exact-vs-approx switch (approximate_threshold analog, Q8): tiny
        # segments are scored brute-force — all terms essential, no skipping
        brute = seg_docs.get(seg, 0) < approximate_threshold
        # SECOND exact gate (filtered_exact_search_threshold analog,
        # KNNSettings.java:80): a highly selective accept set switches to
        # brute-force over the accepted docs — only blocks whose id range
        # intersects the accept set are decoded, so a 10-doc filter on a
        # 10M-doc segment touches ~10 blocks instead of walking MaxScore
        filtered_exact = (
            not brute and allow is not None
            and allow.size < filtered_exact_threshold
        )
        ids, scores, scanned, skipped = _blockmax_maxscore(
            blocks, idf_map, k1, b, avgdl_map, k, min_score, allow, deny,
            brute or filtered_exact, allow_prune=filtered_exact,
        )
        if min_score is not None and ids.size:
            keep = scores >= min_score
            ids, scores = ids[keep], scores[keep]
        n_cand = int(ids.size)
        order = np.lexsort((ids, -scores))
        if k_keep is not None:
            order = order[: min(k_keep, order.size)]
        ids, scores = ids[order], scores[order]
        strategy = (
            "taat_filtered"
            if filtered_exact
            else ("taat" if brute else "block_max_maxscore")
        )
        out = pd.DataFrame(
            {
                "doc_id": np.concatenate((ids, [-1])),
                "score": np.concatenate((scores, [float(n_cand)])),
                "segment_id": seg,
                "blocks_scanned": np.int32(scanned),
                "blocks_skipped": np.int32(skipped),
                "strategy": strategy,
            }
        )
        return out

    return kernel


def _empty_hits():
    return pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
            "segment_id": pd.Series(dtype="object"),
            "blocks_scanned": pd.Series(dtype="int32"),
            "blocks_skipped": pd.Series(dtype="int32"),
            "strategy": pd.Series(dtype="object"),
        }
    )


def _phrase_allowed(blocks: pd.DataFrame, phrases: list[list[str]]) -> np.ndarray:
    """Docs (within this segment's blocks) containing every phrase as an
    exact adjacent token run. Fully vectorized: occurrences become
    (doc << 22 | position) keys; for each subsequent phrase term the
    surviving keys advance by one position and intersect with that term's
    key set (sorted-merge membership). The positions tier is the analog of
    the reference's full-precision data enabling the exact second pass."""
    from pysearch.codec import decode_blocks_batch, decode_positions

    allowed: np.ndarray | None = None
    for phrase in phrases:
        surv: np.ndarray | None = None
        for j, term in enumerate(phrase):
            g = blocks[blocks["term"] == term].sort_values("first_id", kind="mergesort")
            if not len(g):
                surv = np.empty(0, dtype=np.int64)
                break
            ids, tfs, _dls = decode_blocks_batch(
                g["first_id"].to_numpy(np.int64),
                g["last_id"].to_numpy(np.int64),
                g["n"].to_numpy(np.int64),
                list(g["ids"]),
                list(g["tfs"]),
                list(g["dls"]),
                g["codec"].to_numpy(np.int64),
            )
            poss_bufs = list(g["poss"])
            if any(b is None for b in poss_bufs):
                raise ValueError("segment lacks positions (store_positions off)")
            pos = decode_positions(tfs, b"".join(poss_bufs))
            keys = (np.repeat(ids, tfs) << _POS_SHIFT) | pos.astype(np.int64)
            # ascending by construction: ids ascend, positions ascend in-posting
            if j == 0:
                surv = keys
            else:
                want = surv + 1
                surv = want[_member(want, keys)]
            if surv.size == 0:
                break
        docs = (
            np.unique(surv >> _POS_SHIFT)
            if surv is not None and surv.size
            else np.empty(0, dtype=np.int64)
        )
        allowed = docs if allowed is None else np.intersect1d(allowed, docs)
        if allowed.size == 0:
            break
    return allowed if allowed is not None else np.empty(0, dtype=np.int64)


def _restriction_sets(restrict: pd.DataFrame, filter_present: bool, bitmap_sel: float):
    """Accept-bits representations (FilterIdsSelector.java:29-60 analog):
    sorted id arrays here; membership tests use np.searchsorted, which is the
    sorted-array ("BATCH") strategy — for very dense sets the same test is
    done via a bitmap over the segment's id range (picked in _member)."""
    allow = deny = None
    if len(restrict):
        a = restrict.loc[restrict["flag"] == 1, "doc_id"].to_numpy(dtype=np.int64)
        d = restrict.loc[restrict["flag"] == 0, "doc_id"].to_numpy(dtype=np.int64)
        if filter_present:
            allow = np.unique(a) if a.size else None
        deny = np.unique(d) if d.size else None
    elif filter_present:
        allow = None
    return allow, deny


def _member(ids: np.ndarray, sset: np.ndarray) -> np.ndarray:
    """Vectorized membership of `ids` in sorted set `sset` — bitmap when the
    set is dense over its range, binary search otherwise (Q6 cost switch)."""
    if sset.size == 0:
        return np.zeros(ids.size, dtype=bool)
    lo, hi = int(sset[0]), int(sset[-1])
    span = hi - lo + 1
    if span <= 4 * sset.size and span <= (1 << 26):  # dense -> bitmap
        bm = np.zeros(span, dtype=bool)
        bm[sset - lo] = True
        in_range = (ids >= lo) & (ids <= hi)
        out = np.zeros(ids.size, dtype=bool)
        out[in_range] = bm[ids[in_range] - lo]
        return out
    pos = np.searchsorted(sset, ids)
    pos = np.minimum(pos, sset.size - 1)
    return sset[pos] == ids


def _blockmax_maxscore(
    blocks: pd.DataFrame,
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl_map: dict[str, float],
    k: int,
    min_score: float | None,
    allow: np.ndarray | None,
    deny: np.ndarray | None,
    brute: bool,
    allow_prune: bool = False,
):
    """idf_map values carry the query-time field weight folded in; avgdl_map
    gives each (possibly field-namespaced) term its FIELD's avgdl, so a
    multi-field query is just MaxScore over the union of per-field terms."""
    from pysearch.codec import decode_blocks_batch

    # organize per term, blocks ascending by first_id
    by_term = {}
    for term, g in blocks.groupby("term", sort=False):
        g = g.sort_values("first_id", kind="mergesort")
        idf = idf_map.get(term)
        if idf is None:
            continue
        avgdl = avgdl_map[term]
        max_tf = g["max_tf"].to_numpy(dtype=np.float64)
        min_dl = g["min_dl"].to_numpy(dtype=np.float64)
        block_ub = idf * max_tf / (max_tf + k1 * (1 - b + b * min_dl / avgdl))
        by_term[term] = (g, block_ub, idf, float(block_ub.max()), avgdl)

    # descending max upper bound (MaxScore term order)
    order = sorted(by_term, key=lambda t: -by_term[t][3])
    max_ubs = np.array([by_term[t][3] for t in order])
    suffix = np.concatenate((np.cumsum(max_ubs[::-1])[::-1], [0.0]))

    cand_ids = np.empty(0, dtype=np.int64)
    cand_scores = np.empty(0, dtype=np.float64)
    theta = min_score if min_score is not None else -np.inf
    scanned = skipped = 0

    def contrib(tfs, dls, idf, avgdl):
        return idf * tfs / (tfs + k1 * (1 - b + b * dls / avgdl))

    for i, term in enumerate(order):
        g, block_ub, idf, _, avgdl = by_term[term]
        rem = suffix[i + 1]
        essential = brute or not (suffix[i] < theta)

        firsts = g["first_id"].to_numpy(dtype=np.int64)
        lasts = g["last_id"].to_numpy(dtype=np.int64)
        ns = g["n"].to_numpy(dtype=np.int64)
        if allow_prune:
            # filtered-exact mode: every term is essential, but only blocks
            # whose [first_id, last_id] range contains an ACCEPTED doc are
            # decoded at all — the accept set drives the scan, not θ
            lo = np.searchsorted(allow, firsts, side="left")
            hi = np.searchsorted(allow, lasts, side="right")
            sel = hi > lo
        elif essential:
            sel = np.ones(len(g), dtype=bool)
        else:
            # completion phase: only blocks that contain a candidate matter
            lo = np.searchsorted(cand_ids, firsts, side="left")
            hi = np.searchsorted(cand_ids, lasts, side="right")
            sel = hi > lo
        scanned += int(sel.sum())
        skipped += int(len(g) - sel.sum())
        if not sel.any():
            continue

        gsel = g.iloc[np.flatnonzero(sel)]
        ids, tfs, dls = decode_blocks_batch(
            firsts[sel],
            lasts[sel],
            ns[sel],
            list(gsel["ids"]),
            list(gsel["tfs"]),
            list(gsel["dls"]),
            gsel["codec"].to_numpy(np.int64),
        )
        sc = contrib(tfs.astype(np.float64), dls.astype(np.float64), idf, avgdl)

        if deny is not None:
            keep = ~_member(ids, deny)
            ids, sc = ids[keep], sc[keep]
        if allow is not None:
            keep = _member(ids, allow)
            ids, sc = ids[keep], sc[keep]
        if ids.size == 0:
            continue

        pos = np.searchsorted(cand_ids, ids)
        pos_c = np.minimum(pos, max(cand_ids.size - 1, 0))
        exists = (
            (cand_ids[pos_c] == ids) if cand_ids.size else np.zeros(ids.size, dtype=bool)
        )
        # existing candidates: complete their exact scores (ids unique per term)
        cand_scores[pos_c[exists]] += sc[exists]
        if essential:
            new_ids, new_sc = ids[~exists], sc[~exists]
            if new_ids.size:
                cand_ids = np.concatenate((cand_ids, new_ids))
                cand_scores = np.concatenate((cand_scores, new_sc))
                srt = np.argsort(cand_ids, kind="mergesort")
                cand_ids, cand_scores = cand_ids[srt], cand_scores[srt]
        # raise θ: k-th best partial is a lower bound on k-th best final
        if min_score is None and cand_scores.size >= k:
            theta = np.partition(cand_scores, cand_scores.size - k)[
                cand_scores.size - k
            ]

    return cand_ids, cand_scores, scanned, skipped
