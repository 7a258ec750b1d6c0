from kenlm_spark.ngram.arpa import load_arpa, loads_arpa
from kenlm_spark.ngram.hashing import combine_word_hash, murmur_hash64a, ngram_key
from kenlm_spark.ngram.model import BOS, EOS, UNK, NGramModel, State

__all__ = [
    "BOS",
    "EOS",
    "UNK",
    "NGramModel",
    "State",
    "combine_word_hash",
    "load_arpa",
    "loads_arpa",
    "murmur_hash64a",
    "ngram_key",
]
