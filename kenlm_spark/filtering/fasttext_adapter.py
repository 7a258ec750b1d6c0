"""Adapter that slots a real fastText language-ID model into the
pipeline (`FilterConfig.langid_expr`).

The fastText library and its released lid model (`lid.176.bin`) are not
in this container, so the engine's DEFAULT langid stays the
oracle-checkable Catalyst classifier (`filtering.langid`) with the
in-engine-trained NB (`filtering.langid_nb`) as the supervised twin.
This module makes the "fastText when available" claim concrete instead
of a docstring promise:

* :func:`fasttext_langid_expr` returns a callable with the exact
  ``langid_expr`` contract — ``(text Column) -> language-code Column`` —
  backed by an Arrow-batched pandas UDF (never per-row Python).
* The model is loaded ONCE per executor process (lazy module-level
  cache keyed by path) — fastText mmap-loads its matrix, so each of the
  N executors pays one load, not one per batch. Nothing model-sized is
  ever pickled into the closure: the UDF captures only the path.
* ``model_factory`` injects the loader; the default imports ``fasttext``
  and raises an actionable error when the library is absent. Tests
  inject a deterministic fake factory, which exercises every line of
  the adapter (batching, newline scrubbing, label stripping, the cache)
  without the binary wheel — the only untested line is
  ``import fasttext`` itself.
"""

from __future__ import annotations

from typing import Callable

# MODULE-level import: pandas_udf resolves the stringified type hints
# (future-annotations) in the function's globals — a function-local
# ``import pandas as pd`` leaves 'pd.Series' unresolvable.
import pandas as pd
from pyspark.sql import Column

#: Per-process model cache: executor workers are long-lived, so the
#: first batch pays the load and every later batch reuses it.
_MODELS: dict = {}


def _default_factory(path: str):
    try:
        import fasttext  # type: ignore
    except ImportError as e:  # pragma: no cover - library absent here
        raise ImportError(
            "fasttext is not installed; install the 'fasttext' wheel and "
            "download a lid model (e.g. lid.176.bin) to use "
            "fasttext_langid_expr, or keep the built-in Catalyst/NB "
            "language-ID (the default)."
        ) from e
    return fasttext.load_model(path)


def _factory_fingerprint(factory: Callable) -> str:
    """Stable-per-task, distinct-per-behavior key component: name alone
    collides for two lambdas/closures sharing a qualname but carrying
    different bound state, so fold in a hash of the code object and the
    closure/default values' reprs. cloudpickle re-deserializes the same
    factory to an object with IDENTICAL code bytes and cell values, so
    this still hits the cache across tasks."""
    import hashlib

    code = getattr(factory, "__code__", None)
    if code is None:  # bound methods / callables: fall back to name
        return repr(type(factory)) + getattr(factory, "__qualname__", "")
    cells = getattr(factory, "__closure__", None) or ()
    cell_vals = []
    for c in cells:
        try:
            cell_vals.append(repr(c.cell_contents))
        except ValueError:  # empty cell
            cell_vals.append("<empty>")
    payload = (
        code.co_code
        + repr(code.co_consts).encode()
        + repr(cell_vals).encode()
        + repr(getattr(factory, "__defaults__", None)).encode()
    )
    return hashlib.md5(payload).hexdigest()


def _get_model(path: str, factory: Callable, cache_token: str | None = None):
    # Key by path + a behavior fingerprint of the factory, never the
    # function object: a closure-serialized factory deserializes as a
    # fresh object per task, so identity-keying would miss the cache on
    # every task and reload the ~130MB model each time (and leak the old
    # ones). The fingerprint hashes code + closure state so two distinct
    # factories sharing a __qualname__ cannot collide; callers can pin
    # an explicit ``cache_token`` instead.
    key = (
        path,
        cache_token
        if cache_token is not None
        else (
            getattr(factory, "__module__", ""),
            getattr(factory, "__qualname__", repr(factory)),
            _factory_fingerprint(factory),
        ),
    )
    if key not in _MODELS:
        _MODELS[key] = factory(path)
    return _MODELS[key]


def fasttext_langid_expr(
    model_path: str,
    model_factory: Callable | None = None,
    cache_token: str | None = None,
) -> Callable[[Column], Column]:
    """Build a ``FilterConfig.langid_expr`` replacement using fastText.

    ``model_factory(path)`` must return an object with fastText's
    ``predict(list[str], k=1) -> (labels, probs)`` API where each label
    is ``__label__<code>``; defaults to ``fasttext.load_model``.
    ``cache_token`` pins the per-executor cache key explicitly when the
    factory's code/closure fingerprint is not the right identity (e.g.
    a factory reading mutable global config).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    factory = model_factory or _default_factory

    @F.pandas_udf(StringType())
    def _ft_lang(texts: pd.Series) -> pd.Series:
        model = _get_model(model_path, factory, cache_token)
        # fastText rejects embedded newlines; predict the whole Arrow
        # batch in one call (its C++ loop, not a Python per-row loop).
        clean = [
            (t or "").replace("\n", " ").replace("\r", " ") for t in texts
        ]
        labels, _ = model.predict(clean, k=1)
        return pd.Series(
            [
                (l[0][len("__label__"):] if l else "und")
                for l in labels
            ]
        )

    return lambda col: _ft_lang(col)
