from kenlm_spark.operators.ngrams import ngram_counts, word_counts

__all__ = ["ngram_counts", "word_counts"]
