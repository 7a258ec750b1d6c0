"""ChartState / RuleScore — scoring sentence fragments with unknown left
context, transcribed from ``lm/left.hh:52-216`` (and ``lm/state.hh``'s
ChartState). Intended usage mirrors the reference:

    state = ChartState()
    score = RuleScore(model, state)
    score.terminal(model.word_id("more"))
    score.terminal(model.word_id("loin"))
    log10 = score.finish()

Fragments compose: ``non_terminal(other_state, other_prob)`` splices a
previously scored fragment to the RIGHT of the current one, re-scoring
only the boundary words via :meth:`NGramModel.extend_left_score` — the
O(order) chart-decoder primitive, golden-tested against
``lm/left_test.cc`` and ``lm/model_test.cc:182-224`` (ExtendLeftTest).

The Spark relevance: fragment scoring is a per-row computation (each
caption/segment carries its own ChartState), so it rides the same
broadcast-model mapInPandas path as the sequential scorer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kenlm_spark.ngram.model import FullScoreReturn, NGramModel, State


@dataclass
class LeftState:
    """lm/state.hh Left: extend pointers of the fragment's leftmost
    matches; ``pointers[i]`` extends an (i+1)-gram."""

    pointers: list[int] = field(default_factory=list)
    full: bool = False

    @property
    def length(self) -> int:
        return len(self.pointers)

    def copy(self) -> "LeftState":
        return LeftState(list(self.pointers), self.full)


@dataclass
class ChartState:
    left: LeftState = field(default_factory=LeftState)
    right: State = field(default_factory=State)

    def copy(self) -> "ChartState":
        return ChartState(
            self.left.copy(), State(list(self.right.words), list(self.right.backoffs))
        )


def _copy_state(s: State) -> State:
    return State(list(s.words), list(s.backoffs))


class RuleScore:
    """lm/left.hh:52-216 RuleScore<M>."""

    def __init__(self, model: NGramModel, out: ChartState) -> None:
        self.model = model
        self.out = out
        out.left = LeftState()
        out.right = State()
        self.left_done = False
        self.prob = 0.0

    def begin_sentence(self) -> None:
        self.out.right = self.model.begin_sentence_state()
        self.left_done = True

    def terminal(self, word_id: int) -> None:
        prev_len = self.out.right.length
        ret, self.out.right = self.model.full_score(self.out.right, word_id)
        if self.left_done:
            self.prob += ret.log10_prob
            return
        if ret.independent_left:
            self.prob += ret.log10_prob
            self.left_done = True
            return
        self.out.left.pointers.append(ret.extend_left)
        self.prob += ret.rest
        if self.out.right.length != prev_len + 1:
            self.left_done = True

    def begin_non_terminal(self, in_state: ChartState, prob: float = 0.0) -> None:
        self.prob = prob
        self.out.left = in_state.left.copy()
        self.out.right = _copy_state(in_state.right)
        self.left_done = in_state.left.full

    def non_terminal(self, in_state: ChartState, prob: float = 0.0) -> None:
        self.prob += prob

        if not in_state.left.length:
            if in_state.left.full:
                self.prob += sum(self.out.right.backoffs)
                self.left_done = True
                self.out.right = _copy_state(in_state.right)
            return

        if not self.out.right.length:
            self.out.right = _copy_state(in_state.right)
            if self.left_done:
                self.prob += self.model.unrest(in_state.left.pointers, 1)
                return
            if self.out.left.length:
                self.left_done = True
            else:
                self.out.left = in_state.left.copy()
                self.left_done = in_state.left.full
            return

        back = list(self.out.right.backoffs)
        self.next_use = self.out.right.length

        # First word
        done, back = self._extend_left(in_state, 1, back)
        if done:
            return
        # Words after the first, so extending a bigram to begin with
        for extend_length in range(2, in_state.left.length + 1):
            done, back = self._extend_left(in_state, extend_length, back)
            if done:
                return

        if in_state.left.full:
            self.prob += sum(back[: self.next_use])
            self.left_done = True
            self.out.right = _copy_state(in_state.right)
            return

        # Right state was minimized, so it's already independent of the
        # new words to the left.
        if in_state.right.length < in_state.left.length:
            self.out.right = _copy_state(in_state.right)
            return

        # Splice: in.right's words are the more recent context; survivors
        # of the current right state follow (most-recent-first layout).
        self.out.right = State(
            list(in_state.right.words) + self.out.right.words[: self.next_use],
            list(in_state.right.backoffs) + back[: self.next_use],
        )

    def finish(self) -> float:
        # An (order-1)-gram might extend left and right but is still full.
        self.out.left.full = self.left_done or (
            self.out.left.length == self.model.order - 1
        )
        return self.prob

    def reset(self, replacement: ChartState | None = None) -> None:
        if replacement is not None:
            self.out = replacement
        self.prob = 0.0
        self.left_done = False
        self.out.left = LeftState()
        self.out.right = State()

    # ------------------------------------------------------------- internals

    def _extend_left(
        self, in_state: ChartState, extend_length: int, back_in: list[float]
    ) -> tuple[bool, list[float]]:
        """lm/left.hh:169-186."""
        ret, back_out, next_use = self.model.extend_left_score(
            self.out.right.words[: self.next_use],
            back_in,
            in_state.left.pointers[extend_length - 1],
            extend_length,
        )
        self._process_ret(ret)
        if next_use != self.out.right.length:
            self.left_done = True
            if not next_use:
                # Early exit.
                self.out.right = _copy_state(in_state.right)
                self.prob += self.model.unrest(
                    in_state.left.pointers[extend_length:], extend_length + 1
                )
                return True, back_out
        self.next_use = next_use
        return False, back_out

    def _process_ret(self, ret: FullScoreReturn) -> None:
        """lm/left.hh:188-199."""
        if self.left_done:
            self.prob += ret.log10_prob
            return
        if ret.independent_left:
            self.prob += ret.log10_prob
            self.left_done = True
            return
        self.out.left.pointers.append(ret.extend_left)
        self.prob += ret.rest
