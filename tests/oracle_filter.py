"""Row-by-row pure-Python reference implementation of the filter pipeline.

This is the "reference decisions" oracle for the F1 >= 0.99 acceptance
test: it shares NO code path with the Spark pipeline's execution — scoring
uses the stateful per-token loop (itself validated against the reference's
golden unit tests), language/quality/scrub are reimplemented with ``re`` and
plain Python over one row at a time.
"""

from __future__ import annotations

import re

from kenlm_spark.filtering.langid import py_lang
from kenlm_spark.filtering.scrub import py_scrub
from kenlm_spark.ngram.model import NGramModel

TOKEN_RE = re.compile("[\x00\t\n\r ]+")

QUALITY = {
    "min_tokens": 3,
    "max_tokens": 128,
    "min_mean_token_len": 2.0,
    "max_mean_token_len": 12.0,
    "min_alpha_ratio": 0.5,
    "max_digit_ratio": 0.2,
    "max_upper_ratio": 0.5,
    "long_token_limit": 30,
    "min_distinct_ratio": 0.4,
}


def quality_pass(text: str) -> bool:
    text = text or ""
    toks = [t for t in TOKEN_RE.split(text) if t]
    n_tokens = len(toks)
    n_chars = len(text)
    safe_n = max(n_tokens, 1)
    safe_c = max(n_chars, 1)
    mean_tok = sum(len(t) for t in toks) / safe_n
    alpha = len(re.sub("[^a-zA-Z]", "", text)) / safe_c
    digit = len(re.sub("[^0-9]", "", text)) / safe_c
    upper = len(re.sub("[^A-Z]", "", text)) / safe_c
    has_long = any(len(t) > QUALITY["long_token_limit"] for t in toks)
    distinct = len({t.lower() for t in toks}) / safe_n
    q = QUALITY
    return (
        q["min_tokens"] <= n_tokens <= q["max_tokens"]
        and q["min_mean_token_len"] <= mean_tok <= q["max_mean_token_len"]
        and alpha >= q["min_alpha_ratio"]
        and digit <= q["max_digit_ratio"]
        and upper <= q["max_upper_ratio"]
        and not has_long
        and distinct >= q["min_distinct_ratio"]
    )


def reference_row(
    model: NGramModel,
    caption: str,
    allowed_langs=("en",),
    max_perplexity: float = 1e5,
    max_oov_ratio: float = 0.5,
) -> dict:
    """Compute the reference keep/drop + scrub decision for one caption."""
    caption = caption or ""
    toks = [t for t in TOKEN_RE.split(caption) if t]
    state = model.begin_sentence_state()
    total, oov = 0.0, 0
    for t in toks:
        ret, state = model.full_score(state, model.word_id(t))
        total += ret.log10_prob
        oov += int(ret.oov)
    ret, state = model.full_score(state, model.eos_id)
    total += ret.log10_prob
    oov += int(ret.oov)
    ppl = 10.0 ** (-total / (len(toks) + 1))

    if not quality_pass(caption):
        reason = "quality"
    elif py_lang(caption) not in allowed_langs:
        reason = "lang"
    elif oov / max(len(toks), 1) > max_oov_ratio:
        reason = "oov"
    elif ppl > max_perplexity:
        reason = "perplexity"
    else:
        reason = None
    return {
        "keep": reason is None,
        "drop_reason": reason,
        "scrubbed_caption": py_scrub(caption),
        "log10_prob": total,
        "perplexity": ppl,
        "oov_count": oov,
        "lang": py_lang(caption),
    }
