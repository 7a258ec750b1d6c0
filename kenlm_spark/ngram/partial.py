"""Partial-state scoring — transcribed from ``lm/partial.hh`` (ExtendLoop,
RevealBefore, RevealAfter, Subsume).

These adjust a fragment's score as context becomes known without
re-scoring the fragment: ``reveal_before`` discloses words to the LEFT of
a ChartState, ``reveal_after`` discloses a left-state to its RIGHT, and
``subsume`` merges two adjacent states. Used by decoders for hypothesis
recombination; here golden-tested against ``lm/partial_test.cc``
(including FullDivide: every split of three sentences must telescope back
to the full RuleScore result, under a REST_PROBING model).
"""

from __future__ import annotations

from kenlm_spark.ngram.left import LeftState
from kenlm_spark.ngram.model import NGramModel, State


class _ExtendValue:
    __slots__ = ("adjust", "make_full", "next_use")

    def __init__(self):
        self.adjust = 0.0
        self.make_full = False
        self.next_use = 0


def _extend_loop(
    model: NGramModel,
    seen: int,
    add_words: list[int],
    backoff_start: list[float],
    pointers: list[int],
    write_pointers: bool,
):
    """lm/partial.hh:19-81. Returns (value, new_pointers, backoff_out):
    ``new_pointers`` is meaningful only when ``write_pointers`` (the
    existing left state was not full); ``backoff_out[:value.next_use]``
    are the backoffs of the surviving add words."""
    add_length = len(add_words)
    backoff_in = list(backoff_start[:add_length])

    value = _ExtendValue()
    value.next_use = add_length

    new_pointers: list[int] = []
    i = 0
    length = len(pointers)
    if write_pointers:
        # Using full context, writing to new left state.
        while i < length:
            ret, backoff_out, next_use = model.extend_left_score(
                add_words[: value.next_use], backoff_in, pointers[i],
                i + seen + 1,
            )
            backoff_in = backoff_out
            value.next_use = next_use
            if ret.independent_left:
                value.adjust += ret.log10_prob
                value.make_full = True
                i += 1
                break
            value.adjust += ret.rest
            new_pointers.append(ret.extend_left)
            if value.next_use != add_length:
                value.make_full = True
                i += 1
                break
            i += 1
    # Using some of the new context.
    while i < length and value.next_use:
        ret, backoff_out, next_use = model.extend_left_score(
            add_words[: value.next_use], backoff_in, pointers[i], i + seen + 1
        )
        backoff_in = backoff_out
        value.next_use = next_use
        value.adjust += ret.log10_prob
        i += 1
    # Using none of the new context.
    value.adjust += model.unrest(pointers[i:], i + seen + 1)
    return value, new_pointers, backoff_in


def reveal_before(
    model: NGramModel,
    reveal: State,
    seen: int,
    reveal_full: bool,
    left: LeftState,
    right: State,
) -> float:
    """lm/partial.hh:83-108 RevealBefore: disclose context to the LEFT."""
    assert seen < reveal.length or reveal_full
    write_pointers = not reveal_full
    value, new_pointers, backoff_out = _extend_loop(
        model,
        seen,
        reveal.words[seen:],
        reveal.backoffs[seen:],
        list(left.pointers),
        write_pointers,
    )
    if reveal_full:
        left.pointers = []
        value.make_full = True
    else:
        left.pointers = new_pointers
        value.make_full |= len(left.pointers) == model.order - 1
    if left.full:
        value.adjust += sum(backoff_out[: value.next_use])
    else:
        # If left wasn't full when it came in, put words into right state.
        right.words.extend(reveal.words[seen : seen + value.next_use])
        right.backoffs.extend(backoff_out[: value.next_use])
        left.full = value.make_full or (right.length == model.order - 1)
    return value.adjust


def reveal_after(
    model: NGramModel,
    left: LeftState,
    right: State,
    reveal: LeftState,
    seen: int,
) -> float:
    """lm/partial.hh:110-134 RevealAfter: disclose a left state to the
    RIGHT of this state."""
    assert seen < reveal.length or reveal.full
    write_pointers = not left.full
    value, new_pointers, backoff_out = _extend_loop(
        model,
        seen,
        list(right.words),
        list(right.backoffs),
        list(reveal.pointers[seen:]),
        write_pointers,
    )
    if reveal.full:
        value.adjust += sum(backoff_out[: value.next_use])
        right.words, right.backoffs = [], []
        value.make_full = True
    else:
        right.words = right.words[: value.next_use]
        right.backoffs = backoff_out[: value.next_use]
        value.make_full |= right.length == model.order - 1
    if not left.full:
        left.pointers = left.pointers + new_pointers
        left.full = value.make_full or (len(left.pointers) == model.order - 1)
    return value.adjust


def subsume(
    model: NGramModel,
    first_left: LeftState,
    first_right: State,
    second_left: LeftState,
    second_right: State,
    between_length: int,
) -> float:
    """lm/partial.hh:136-162 Subsume: merge two adjacent partial states
    separated by ``between_length`` already-counted words."""
    assert first_right.length < model.order
    assert second_left.length < model.order
    write_pointers = not first_left.full
    value, new_pointers, backoff_out = _extend_loop(
        model,
        between_length,
        list(first_right.words),
        list(first_right.backoffs),
        list(second_left.pointers),
        write_pointers,
    )
    if second_left.full:
        value.adjust += sum(backoff_out[: value.next_use])
    else:
        second_right.words.extend(first_right.words[: value.next_use])
        second_right.backoffs.extend(backoff_out[: value.next_use])
        value.make_full |= second_right.length == model.order - 1
    if not first_left.full:
        first_left.pointers = first_left.pointers + new_pointers
        first_left.full = (
            value.make_full
            or second_left.full
            or (len(first_left.pointers) == model.order - 1)
        )
    return value.adjust
