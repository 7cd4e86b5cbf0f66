from .kmer import kmer_count, kmer_sink, total_kmers  # noqa: F401
