from kenlm_spark.filtering.langid import LANG_PRIORITY, STOPWORDS, with_langid
from kenlm_spark.filtering.quality import with_quality_metrics
from kenlm_spark.filtering.scrub import SCRUB_RULES, with_scrubbed

__all__ = [
    "LANG_PRIORITY",
    "SCRUB_RULES",
    "STOPWORDS",
    "with_langid",
    "with_quality_metrics",
    "with_scrubbed",
]
