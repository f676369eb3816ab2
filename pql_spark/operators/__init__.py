"""Large-scale data-pipeline operators (beyond the reference surface).

The reference (runreveal/pql) stops at the query language; these are the
operations a 100 TB training-data pipeline needs on top: deduplication,
similarity search, text analysis, and multimodal column plumbing.  Every
operator here is built from JVM-side ``pyspark.sql.functions`` (higher-
order array functions, md5/xxhash64, regexp) so the hot path never leaves
whole-stage codegen — no row-at-a-time Python.
"""

from .dedup import (
    dedup_exact,
    dedup_incremental,
    embedding_dup_pairs,
    kmv_distinct,
    minhash_dup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)
from .sampling import (
    deterministic_shuffle,
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)
from .similarity import cosine_topk, lsh_bucket_topk, pairwise_topk
from .temporal import asof_join, range_join
from .text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokens,
    winnow_fingerprints,
    word_shingles,
)

__all__ = [
    "asof_join",
    "cosine_topk",
    "dedup_exact",
    "dedup_incremental",
    "deterministic_shuffle",
    "doc_fingerprint",
    "embedding_dup_pairs",
    "hash_sample",
    "kmv_distinct",
    "language_id",
    "lsh_bucket_topk",
    "minhash_dup_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "pairwise_topk",
    "quality_score",
    "range_join",
    "simhash",
    "simhash_dedup",
    "stratified_hash_sample",
    "token_stats",
    "train_test_split",
    "tokens",
    "winnow_fingerprints",
    "word_shingles",
]
