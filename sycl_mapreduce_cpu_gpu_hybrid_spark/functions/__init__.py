from .porthash import portable_hash64, portable_hash64_sql  # noqa: F401
from .text import (  # noqa: F401
    STOPWORDS,
    alpha_ratio,
    bpe_ish_token_count,
    lang_id,
    lang_scores,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
    winnowing_fingerprints,
)
from .udf import (  # noqa: F401
    register_grouped_agg_kernel,
    register_scalar_kernel,
    vowel_ratio_udf,
)
