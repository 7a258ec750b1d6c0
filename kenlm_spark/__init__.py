"""kenlm_spark — a PySpark-native analytics engine for web-scale
caption/document quality filtering with KenLM-semantics n-gram scoring.

Built from scratch on the PySpark DataFrame API; the reference
(kpu/kenlm, read-only at /root/reference) defines WHAT is computed —
backoff n-gram scoring, model estimation, filtering — while execution is
Spark-first: Catalyst expressions on the hot path, Arrow-batched pandas
UDFs where imperative token loops are unavoidable, broadcast models
instead of mmap.
"""

from kenlm_spark.ngram.arpa import load_arpa, loads_arpa
from kenlm_spark.ngram.model import NGramModel

__all__ = ["NGramModel", "load_arpa", "loads_arpa"]
__version__ = "0.1.0"
