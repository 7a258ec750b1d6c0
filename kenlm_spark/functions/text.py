"""Catalyst-native text functions shared by the scorer and the filter.

Tokenization matches the reference corpus reader exactly: tokens are split
on the byte set ``\\0 \\t \\n \\r space`` — strictly that set, not general
whitespace (``lm/builder/corpus_count.cc:242``, ``util/file_piece.hh:99``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The exact delimiter class of the reference tokenizer.
TOKEN_DELIMS_RE = "[\\x00\\t\\n\\r ]+"

#: Python-side compiled twin for use inside pandas UDFs — same byte class.
PY_TOKEN_RE = re.compile("[\x00\t\n\r ]+")


def tokenize(col: Column | str) -> Column:
    """caption → array<string> of non-empty tokens (Catalyst expression).

    ``F.split`` keeps empty strings at the edges; ``array_remove`` drops
    them the same way the reference skips delimiter runs. array_remove is
    used instead of a ``filter`` lambda because interpreted higher-order
    functions allocate heavily and throttle multi-core scaling (measured:
    lambda-based variants stopped scaling past 8 local cores from GC
    pressure).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, TOKEN_DELIMS_RE), "")


def py_tokenize(text: str) -> list[str]:
    """Python twin of :func:`tokenize` for UDF interiors and oracles."""
    if not text:
        return []
    return [t for t in PY_TOKEN_RE.split(text) if t]
