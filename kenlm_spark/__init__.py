"""kenlm_spark — a PySpark-native analytics engine for web-scale
caption/document quality filtering with KenLM-semantics n-gram scoring.

Built from scratch on the PySpark DataFrame API; the reference
(kpu/kenlm, read-only at /root/reference) defines WHAT is computed —
backoff n-gram scoring, model estimation, filtering — while execution is
Spark-first: Catalyst expressions on the hot path, Arrow-batched pandas
UDFs where imperative token loops are unavoidable, broadcast models
instead of mmap.
"""

from kenlm_spark.estimator import estimate, to_ngram_model, write_arpa
from kenlm_spark.ngram.arpa import load_arpa, loads_arpa
from kenlm_spark.ngram.model import NGramModel
from kenlm_spark.ngram.scorer import SparkNGramScorer
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline
from kenlm_spark.session import get_spark

__all__ = [
    "FilterConfig",
    "NGramModel",
    "QualityFilterPipeline",
    "SparkNGramScorer",
    "estimate",
    "get_spark",
    "load_arpa",
    "loads_arpa",
    "to_ngram_model",
    "write_arpa",
]
__version__ = "0.1.0"
