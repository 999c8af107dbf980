"""Index configuration.

The analog of the reference's mapping / method parameters:
``mode``, ``compression_level``, ``method`` = disk_ann params (maxConn=32,
beamWidth=100, ...) in KNNConstants.java:108-116 and JVectorFormat.java:34-35
become BM25 + codec + segmenting knobs here. Defaults chosen so the same
config works from unit-test scale to a 1000-executor cluster: segment size is
FIXED (not data-relative), so per-task memory stays constant as the corpus
grows and scale-up means "more segments", never "bigger pandas groups".
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- BM25 similarity (the "space type" analog, SpaceType.java:43-160) ---
    k1: float = 1.2
    b: float = 0.75

    # --- fields (the per-field mapping analog) ---
    # Indexed fields, primary first. The reference maps N knn_vector fields
    # per index with per-field parameters and per-field segment files
    # (KNNVectorFieldMapper.java:101-177, JVectorWriter.java:374-433); here
    # every extra field's postings share the segment files under a
    # field-prefixed term namespace ("<field>\\x1f<term>") with per-field doc
    # lengths and collection stats, so BM25 scores per field and queries
    # combine fields with per-query weights. The primary field ("content")
    # keeps bare terms; phrases/prefix expansion operate on the primary.
    fields: tuple = ("content",)

    # --- segmenting (Lucene segment analog) ---
    # Docs per segment. Bounds every per-task pandas group: a hot term can
    # contribute at most `segment_rows` postings to one group, so skew from
    # boilerplate tokens is structurally capped (north_rule skew handling).
    segment_rows: int = 100_000

    # --- posting codec (the PQ/NVQ compression analog) ---
    # postings per compressed block; per-block (max_tf, min_dl) is the
    # block-max metadata used for WAND upper bounds (the "approximate PQ
    # score" analog of JVectorReader.java:353-366).
    block_size: int = 128
    # posting lists below this many postings stay RAW (uncompressed arrays,
    # CODEC_RAW) — mirrors minimumBatchSizeForQuantization=1024
    # (JVectorWriter.java:263-283): tiny batches skip the compression tier.
    min_block_docs: int = 8
    # store per-posting token positions (enables quoted-phrase queries;
    # roughly doubles posting payload — disable for position-free workloads)
    store_positions: bool = True

    # --- term dictionary layout ---
    # postings are hash-partitioned into `term_buckets` directory partitions
    # so a query prunes to the buckets of its terms (partition pruning), and
    # encoding groups by (segment, bucket) are load-balanced under Zipf skew.
    term_buckets: int = 16

    # --- query-time policy (KNNSettings.java:63,80 analogs) ---
    # segments with fewer live docs than this are scored brute-force
    # (vectorized TAAT) instead of block-max skipping — the
    # `approximate_threshold` (=15000) exact-vs-approx switch.
    approximate_threshold: int = 4096
    # over-query factor: candidates kept per segment = k * overquery before
    # the global reduce (KNNConstants.java:90, default 5).
    overquery_factor: int = 5
    # filter representation switch (FilterIdsSelector.java:29-60): use a
    # dense bitmap when selectivity > this fraction, else a sorted id array.
    filter_bitmap_selectivity: float = 0.01

    # --- merge policy (ForceMergesOnlyMergePolicy.java:34-61 + tiered) ---
    # size-tiered: merge when >= merge_factor segments fall in one size tier
    merge_factor: int = 4
    # incremental (leading-segment) merge is skipped and a full compaction
    # rebuild is done instead when tombstone density exceeds this — the
    # analog of the 0.4 heap-ordinal-density guard (JVectorWriter.java:695-699).
    max_tombstone_density: float = 0.4

    # --- skew (north_rule: explicit salting) ---
    # terms whose per-partition posting count exceeds this are salted into
    # `salt_buckets` sub-keys for the two-phase stats aggregation.
    salt_threshold: int = 250_000
    salt_buckets: int = 8

    # --- misc ---
    seed: int = 42
    extra: dict = field(default_factory=dict)

    def fingerprint(self) -> str:
        """Stable hash of the config — stamped into manifests so a resumed
        build refuses to mix segments produced under different configs
        (the VectorIndexFieldMetadata 'manifest' role, JVectorWriter.java:512-563).
        """
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = IndexConfig()
