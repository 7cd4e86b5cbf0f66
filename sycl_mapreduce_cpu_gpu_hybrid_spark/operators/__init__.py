from .kmer import kmer_count, kmer_explode, kmer_sink, safe_num_to_string, total_kmers  # noqa: F401
from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    embedding_lsh_pairs,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pair_graph,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .similarity import brute_force_topk, cosine_sim, ivf_topk  # noqa: F401
from .multimodal import (  # noqa: F401
    attach_fake_media,
    byte_histogram_features,
    resize_images,
    sample_frames,
)
from .skew import salted_group_sum, salted_join, top_heavy_keys  # noqa: F401
