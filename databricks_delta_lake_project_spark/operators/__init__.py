from .cdc import cdc_apply, latest_changes
from .dedup import (
    deduplicate,
    exact_dedup,
    hamming_distance,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
)
from .multimodal import extract_features, resize_images, sample_frames
from .packing import pack_chunked, pack_greedy, pack_stats
from .sampling import (
    deterministic_shuffle,
    hash_bucket,
    hash_sample,
    hash_split,
    mixture_sample,
    stratified_sample,
)
from .scd import scd2_apply, scd2_prepare_initial
from .skew import capped_collect_list, salted_distinct_count, salted_join

__all__ = [
    "cdc_apply",
    "latest_changes",
    "deduplicate",
    "exact_dedup",
    "hamming_distance",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "simhash",
    "extract_features",
    "resize_images",
    "sample_frames",
    "deterministic_shuffle",
    "hash_bucket",
    "hash_sample",
    "hash_split",
    "mixture_sample",
    "pack_chunked",
    "pack_greedy",
    "pack_stats",
    "stratified_sample",
    "scd2_apply",
    "scd2_prepare_initial",
    "capped_collect_list",
    "salted_distinct_count",
    "salted_join",
]
