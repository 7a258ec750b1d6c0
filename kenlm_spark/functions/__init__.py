from kenlm_spark.functions.text import TOKEN_DELIMS_RE, tokenize

__all__ = ["TOKEN_DELIMS_RE", "tokenize"]
