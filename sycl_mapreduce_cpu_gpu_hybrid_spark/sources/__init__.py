from .tables import TABLE_NAMES, load_table, load_tables, register_views  # noqa: F401
from .corpus import read_text_corpus, strip_fasta, truncate_docs  # noqa: F401
