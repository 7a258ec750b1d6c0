"""In-memory backoff n-gram language model with reference-parity semantics.

This is the broadcast payload of the Spark scorer: per-order sorted uint64 key
arrays with float32 prob/backoff payloads — the same logical structure as the
reference's probing hash tables (``lm/search_hashed.hh:30-41``,
``util/probing_hash_table.hh:90-98``) but stored as sorted arrays so numpy
``searchsorted`` gives vectorized batch lookup on executors.

Semantics reproduced from the reference (all cited file:line are in
/root/reference):

* word ids: ``<unk>`` is always 0 (``lm/word_index.hh:8-10``); misses map
  to 0 (``lm/vocab.hh:160-163``).
* backoff ``-0.0`` vs ``0.0``: ``-0.0`` means "this n-gram is never the
  context of a longer n-gram", which truncates output state and hence which
  backoffs get charged (``lm/blank.hh:22-38``). Entries that do appear as a
  context get flipped to ``+0.0`` at load ("activation",
  ``lm/search_hashed.cc:23-55``).
* blanks: when an n-gram's suffix chain has holes (SRI-pruned models),
  intermediate "blank" entries are hallucinated with prob taken from the
  backoff chain and backoff ``-0.0`` (``lm/search_hashed.cc:57-133``).
* scoring: longest-match prob plus backoff charges for every context order
  the match failed to use (``lm/model.cc:134-140``, ``:245-296``); output
  state minimized by the extension sign bit (``lm/model.cc:262,284-286``).
* missing ``<unk>``: prob -100, backoff 0 (``lm/model.cc:121-126``).

A "stupid backoff" mode replaces learned backoff charges with a fixed
``log10(alpha)`` penalty per skipped context order (alpha=0.4, the constant
from Brants et al. 2007); it is not part of the reference and is gated behind
``stupid_backoff=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .hashing import combine_word_hash, combine_word_hash_vec, ngram_key

UNK = "<unk>"
BOS = "<s>"
EOS = "</s>"

#: lm/config.hh:52-54 — prob assigned when the ARPA lacks <unk>.
UNKNOWN_MISSING_LOGPROB = -100.0

LOG10_STUPID_ALPHA = float(np.log10(0.4))


def _has_extension(backoff: float) -> bool:
    """lm/blank.hh:31-38 — sign-bit compare with -0.0."""
    return not (backoff == 0.0 and np.signbit(backoff))


@dataclass
class FullScoreReturn:
    """Mirror of lm/return.hh:8-39.

    ``extend_left`` is the hash-chain node of the longest match (for
    unigrams, the word id — parallel to the reference's pointer encoding),
    consumable by :meth:`NGramModel.extend_left_score`. ``rest`` equals
    ``log10_prob`` for these models (no REST_PROBING lower-order weights;
    lm/value.hh ProbingWithoutRest pins Rest == Prob)."""

    log10_prob: float
    ngram_length: int
    oov: bool
    independent_left: bool
    rest: float = 0.0
    extend_left: int = 0


@dataclass
class State:
    """Mirror of lm/state.hh:15-48: words most-recent-first + their backoffs."""

    words: list[int] = field(default_factory=list)
    backoffs: list[float] = field(default_factory=list)

    @property
    def length(self) -> int:
        return len(self.words)


_PROBING_MULT = 1.5  # the reference's default probing multiplier
# Use the probing index only above this key count: below it the sorted
# array binary-searches entirely in L1/L2 and beats the probe loop's
# per-round temporaries (in-situ A/B sweep: searchsorted 1.9x faster at
# 4k keys/order, parity at 16k, probing 1.3x at 64k and 2.0x at 1M —
# and the 100-TB model tier is far past the crossover).
_PROBING_MIN_KEYS = 16384


def _build_probing_table(ks: np.ndarray):
    """Open-addressing linear-probing index over unique uint64 keys —
    (table_keys, table_idx, mask) with empty=key 0, power-2 buckets,
    identity hash (util/probing_hash_table.hh's layout, vectorized).
    Lookup is O(1) probes vs searchsorted's O(log n) cache-missing
    levels: measured 5.5x faster per lookup at 4M keys
    (BENCH/BASELINE.md 'Probing hash-table microbench').  Returns None
    when the layout can't represent the key set (empty, or a real key
    equals the empty sentinel 0)."""
    if len(ks) == 0 or bool((ks == np.uint64(0)).any()):
        return None
    n_buckets = 1 << max(
        1, int(np.ceil(np.log2(max(2, int(len(ks) * _PROBING_MULT)))))
    )
    mask = np.uint64(n_buckets - 1)
    tkeys = np.zeros(n_buckets, dtype=np.uint64)
    tidx = np.full(n_buckets, -1, dtype=np.int64)
    pos = ks & mask
    pending = np.arange(len(ks))
    while len(pending):
        pp = pos[pending]
        order_ = np.argsort(pp, kind="stable")
        p_sorted = pending[order_]
        pp_sorted = pp[order_]
        first = np.ones(len(p_sorted), dtype=bool)
        first[1:] = pp_sorted[1:] != pp_sorted[:-1]
        claim = first & (tkeys[pp_sorted] == 0)
        tkeys[pp_sorted[claim]] = ks[p_sorted[claim]]
        tidx[pp_sorted[claim]] = p_sorted[claim]
        # every non-claimer's bucket is now occupied (pre-existing or
        # claimed this round by the first same-bucket key), so advancing
        # one slot preserves the unbroken-probe-chain invariant
        pending = p_sorted[~claim]
        pos[pending] = (pos[pending] + np.uint64(1)) & mask
    return tkeys, tidx, mask


def _probe_table(table, queries: np.ndarray) -> np.ndarray:
    """Vectorized linear-probing find: original-array index per query,
    -1 on miss (query 0 is always a miss — it is the empty sentinel)."""
    tkeys, tidx, mask = table
    pos = queries & mask
    out = np.full(len(queries), -1, dtype=np.int64)
    active = np.flatnonzero(queries != 0)
    while len(active):
        pa = pos[active]
        v = tkeys[pa]
        hit = v == queries[active]
        out[active[hit]] = tidx[pa[hit]]
        active = active[(~hit) & (v != 0)]
        pos[active] = (pos[active] + np.uint64(1)) & mask
    return out


class NGramModel:
    """Immutable query-side model; picklable, intended for ``sc.broadcast``.

    Per order ``n``: ``keys[n]`` (sorted uint64), ``probs[n]`` (float32),
    ``backoffs[n]`` (float32, absent for the longest order) and
    ``extends[n]`` (bool: some (n+1)-gram ends with this n-gram — the
    ``independent_left`` negation, lm/value_build.hh:26-29).
    Order 1 is indexed directly by word id.
    """

    def __init__(
        self,
        order: int,
        vocab: dict[str, int],
        uni_prob: np.ndarray,
        uni_backoff: np.ndarray,
        uni_extends: np.ndarray,
        keys: dict[int, np.ndarray],
        probs: dict[int, np.ndarray],
        backoffs: dict[int, np.ndarray],
        extends: dict[int, np.ndarray],
        uni_rest: np.ndarray | None = None,
        rests: dict[int, np.ndarray] | None = None,
    ) -> None:
        self.order = order
        self.vocab = vocab
        self.uni_prob = uni_prob
        self.uni_backoff = uni_backoff
        self.uni_extends = uni_extends
        self.keys = keys
        self.probs = probs
        self.backoffs = backoffs
        self.extends = extends
        # REST_PROBING (lm/value.hh): per-entry rest weights for orders
        # 1..order-1 (MaxRestBuild: max over the left-extension closure).
        # None = plain probing, Rest() == Prob().
        self.uni_rest = uni_rest
        self.rests = rests
        self.bos_id = vocab.get(BOS, 0)
        self.eos_id = vocab.get(EOS, 0)
        # per-order probing index, built lazily per process and NOT
        # pickled (broadcast ships the sorted arrays only; each executor
        # rebuilds in one vectorized pass, ~0.2 us/key)
        self._ptables: dict[int, object] = {}

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_ptables"] = {}
        state.pop("_native_scorer", None)  # ctypes handles aren't picklable
        return state

    def _native(self):
        """Per-process compiled scorer (native_kernel.NativeScorer), or
        None when unavailable (no compiler / KENLM_SPARK_NATIVE=0 /
        non-canonical payload dtypes) — the numpy sweep then runs.
        Never pickled; each executor process compiles (cached .so) and
        wires pointers once per model."""
        ns = self.__dict__.get("_native_scorer", False)
        if ns is False:
            try:
                from kenlm_spark.ngram.native_kernel import NativeScorer

                ns = NativeScorer(self)
            except Exception:
                ns = None
            self._native_scorer = ns
        return ns

    def _ptable(self, n: int):
        if n not in self._ptables:
            ks = self.keys[n]
            self._ptables[n] = (
                _build_probing_table(ks)
                if len(ks) >= _PROBING_MIN_KEYS
                else None
            )
        return self._ptables[n]

    @property
    def has_rest(self) -> bool:
        return self.uni_rest is not None

    # ------------------------------------------------------------------ vocab

    def word_id(self, word: str) -> int:
        return self.vocab.get(word, 0)

    def __contains__(self, word: str) -> bool:
        """python/kenlm.pyx:277-279 — vocab membership is Index(word) != 0."""
        return self.vocab.get(word, 0) != 0

    @property
    def vocab_size(self) -> int:
        return len(self.uni_prob)

    # ----------------------------------------------------------------- lookup

    def _find(self, n: int, key: int):
        """Return (prob, backoff, extends, rest) for an order-n key or
        None. rest == prob for non-rest models and for the longest order
        (lm/value.hh: longest entries have no separate rest)."""
        ks = self.keys[n]
        i = int(np.searchsorted(ks, np.uint64(key)))
        if i >= len(ks) or ks[i] != np.uint64(key):
            return None
        prob = float(self.probs[n][i])
        backoff = float(self.backoffs[n][i]) if n < self.order else -0.0
        ext = bool(self.extends[n][i]) if n < self.order else False
        if self.rests is not None and n < self.order:
            rest = float(self.rests[n][i])
        else:
            rest = prob
        return prob, backoff, ext, rest

    def _uni_rest(self, word_id: int) -> float:
        if self.uni_rest is not None:
            return float(self.uni_rest[word_id])
        return float(self.uni_prob[word_id])

    # ------------------------------------------------------------ score paths

    def begin_sentence_state(self) -> State:
        """lm/model.cc:80-89."""
        return State([self.bos_id], [float(self.uni_backoff[self.bos_id])])

    def null_context_state(self) -> State:
        return State([], [])

    def full_score(self, state: State, word_id: int) -> tuple[FullScoreReturn, State]:
        """One FullScore step — lm/model.cc:134-140 + :245-296.

        ``state.words`` is most-recent-first, as in lm/state.hh.
        """
        oov = word_id == 0
        prob = float(self.uni_prob[word_id])
        backoff0 = float(self.uni_backoff[word_id])
        indep = not bool(self.uni_extends[word_id])
        ngram_length = 1
        out_words = [word_id]
        out_backoffs = [backoff0]
        out_len = 1 if _has_extension(backoff0) else 0

        node = word_id
        ext_left = word_id  # unigram extend pointer = word id
        rest = self._uni_rest(word_id)
        for i, ctx_word in enumerate(state.words):
            if indep:
                break
            n = i + 2
            node = combine_word_hash(node, ctx_word)
            if n == self.order:
                hit = self._find(n, node)
                if hit is not None:
                    prob = hit[0]
                    rest = hit[0]
                    ngram_length = n
                indep = True
                break
            hit = self._find(n, node)
            if hit is None:
                indep = True
                break
            prob, bo, ext, rest = hit
            ngram_length = n
            ext_left = node
            out_backoffs.append(bo)
            if _has_extension(bo):
                out_len = n
            indep = not ext
        # rest = matched entry's Rest() BEFORE backoff charges (lm/model.cc
        # FullScore adds backoffs to prob only; rest stays ScoreExceptBackoff's)
        # Backoff charging: lm/model.cc:136-139.
        for j in range(ngram_length - 1, state.length):
            prob += state.backoffs[j]

        out_words.extend(state.words[: max(out_len - 1, 0)])
        out_state = State(out_words[:out_len], out_backoffs[:out_len])
        return (
            FullScoreReturn(prob, ngram_length, oov, indep, rest, ext_left),
            out_state,
        )

    def full_score_forgot_state(
        self, context_ids_rev: list[int], word_id: int
    ) -> FullScoreReturn:
        """lm/model.cc:142-168 — score with a forgotten state: the longest
        match plus backoff charges LOOKED UP from the model (rather than
        carried in a State). Context is most-recent-first; capped at
        order-1 words.
        """
        ctx = list(context_ids_rev)[: self.order - 1]
        oov = word_id == 0
        prob = float(self.uni_prob[word_id])
        length = 1
        # independent_left mirrors full_score/ScoreExceptBackoff: set when
        # the walk up orders dead-ends (failed lookup — by suffix closure
        # no longer context can match), when the matched entry has no left
        # extension, or at full order. It is False only if the ENTIRE
        # given context matched with the last hit still extendable.
        indep = not bool(self.uni_extends[word_id])
        node = word_id
        ext_left = word_id
        rest = self._uni_rest(word_id)
        for i, c in enumerate(ctx):
            if indep:
                break
            n = i + 2
            node = combine_word_hash(node, c)
            if n == self.order:
                hit = self._find(n, node)
                if hit is not None:
                    prob = hit[0]
                    rest = hit[0]
                    length = n
                indep = True
                break
            hit = self._find(n, node)
            if hit is None:
                indep = True
                break
            prob = hit[0]
            rest = hit[3]
            length = n
            ext_left = node
            indep = not bool(hit[2])
        # Charge backoffs of the most-recent m context words, m in
        # [length, len(ctx)]; chain stops at the first missing context
        # (longer ones are absent by suffix closure).
        h = 0
        for m in range(1, len(ctx) + 1):
            h = ctx[0] if m == 1 else combine_word_hash(h, ctx[m - 1])
            if m < length:
                continue
            if m == 1:
                prob += float(self.uni_backoff[ctx[0]])
            else:
                hit = self._find(m, h)
                if hit is None:
                    break
                prob += hit[1]
        return FullScoreReturn(prob, length, oov, indep, rest, ext_left)

    def extend_left_score(
        self,
        add_ids_rev: list[int],
        backoff_in: list[float],
        extend_pointer: int,
        extend_length: int,
    ) -> tuple[FullScoreReturn, list[float], int]:
        """lm/model.cc:195-228 ExtendLeft: extend a previously matched
        n-gram (``extend_pointer`` from a ``FullScoreReturn.extend_left``,
        ``extend_length`` words long) further LEFT with ``add_ids_rev``
        (nearest-first). Returns (ret, backoff_out, next_use):

        * ret.log10_prob — telescoping delta: new longest match minus the
          old match's rest, plus backoff_in charges for unmatched adds;
        * backoff_out[i] — backoff of the (extend_length+1+i)-gram match,
          for composing further scoring to the right;
        * next_use — how many of the add words remain usable as right
          context (0 when the extension dead-ended immediately).
        """
        if extend_length == 1:
            w = int(extend_pointer)
            prob = float(self.uni_prob[w])
            cur_rest = self._uni_rest(w)
            node = w
            ext_left = w
            indep = False  # reference asserts !independent_left here
        else:
            hit = self._find(extend_length, extend_pointer)
            prob = hit[0]
            cur_rest = hit[3]
            node = extend_pointer
            ext_left = extend_pointer
            indep = False
        subtract_me = cur_rest  # the rest the caller previously charged
        length = extend_length
        next_use = extend_length
        backoff_out: list[float] = []

        # ResumeScore (lm/model.cc:272-296) starting at order_minus_2 =
        # extend_length - 1.
        order_minus_2 = extend_length - 1
        for add_word in add_ids_rev:
            if indep:
                break
            node = combine_word_hash(node, add_word)
            if order_minus_2 == self.order - 2:
                indep = True
                hit = self._find(self.order, node)
                if hit is not None:
                    prob = hit[0]
                    cur_rest = hit[0]
                    length = self.order
                break
            hit = self._find(order_minus_2 + 2, node)
            if hit is None:
                # LookupMiddle sets independent_left on a miss
                # (lm/search_hashed.hh:108-113)
                indep = True
                break
            backoff_out.append(hit[1])
            prob = hit[0]
            cur_rest = hit[3]
            length = order_minus_2 + 2
            ext_left = node
            indep = not hit[2]
            if _has_extension(hit[1]):
                next_use = length
            order_minus_2 += 1

        next_use -= extend_length
        rest = cur_rest - subtract_me  # rest excludes the backoff_in charges
        # Charge backoffs of the adds the longer match did not cover.
        for j in range(length - extend_length, len(add_ids_rev)):
            prob += backoff_in[j]
        prob -= subtract_me
        return (
            FullScoreReturn(prob, length, False, indep, rest, ext_left),
            backoff_out,
            next_use,
        )

    def unrest(self, pointers: list[int], first_length: int) -> float:
        """lm/model.hh:100-103 UnRest: Σ (Prob - Rest) along a left-state
        pointer chain — converts optimistic rest charges back to true
        probabilities once the left context becomes known. 0.0 for
        non-rest models (Rest == Prob everywhere)."""
        if not self.has_rest:
            return 0.0
        total = 0.0
        ln = first_length
        for p in pointers:
            if ln == 1:
                total += float(self.uni_prob[int(p)]) - self._uni_rest(int(p))
            else:
                hit = self._find(ln, p)
                total += hit[0] - hit[3]
            ln += 1
        return total

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        """python/kenlm.pyx:153-207 — log10 P of the whole sentence."""
        state = self.begin_sentence_state() if bos else self.null_context_state()
        total = 0.0
        for word in sentence.split():
            ret, state = self.full_score(state, self.word_id(word))
            total += ret.log10_prob
        if eos:
            ret, state = self.full_score(state, self.eos_id)
            total += ret.log10_prob
        return total

    def full_scores(self, sentence: str, bos: bool = True, eos: bool = True):
        """python/kenlm.pyx:217-242 — per-token (prob, ngram_length, oov)."""
        state = self.begin_sentence_state() if bos else self.null_context_state()
        for word in sentence.split():
            ret, state = self.full_score(state, self.word_id(word))
            yield ret.log10_prob, ret.ngram_length, ret.oov
        if eos:
            ret, state = self.full_score(state, self.eos_id)
            yield ret.log10_prob, ret.ngram_length, ret.oov

    def perplexity(self, sentence: str) -> float:
        """python/kenlm.pyx:209-215 — 10**(-score / (words + 1))."""
        words = len(sentence.split()) + 1
        return 10.0 ** (-self.score(sentence) / words)

    # ----------------------------------------------------- vectorized scoring

    def score_batch(
        self,
        token_id_lists: list[np.ndarray],
        bos: bool = True,
        eos: bool = True,
        stupid_backoff: bool = False,
        return_tokens: bool = False,
    ):
        """Vectorized scoring of many sentences at once.

        Returns ``(log10_prob, oov_count, scored_tokens)`` per sentence —
        plus, with ``return_tokens``, per-token detail arrays
        ``(token_log10_prob, ngram_length, token_oov, sent_idx)`` over the
        scored positions (the vectorized twin of :meth:`full_scores`).
        Equivalent to summing :meth:`full_score` over each sentence — the
        textbook backoff recursion telescopes to the same totals as the
        reference's state-based charging (verified by golden tests).

        This is the Spark executor hot path: all per-order lookups are
        ``np.searchsorted`` over the whole batch; the only Python-level loop
        is over the model order (≤ 6 iterations).
        """
        n_sent = len(token_id_lists)
        if n_sent == 0:
            z = np.zeros(0)
            if return_tokens:
                zi = z.astype(np.int64)
                return z, zi, zi, (z, zi, zi.astype(bool), zi)
            return z, z.astype(np.int64), z.astype(np.int64)

        lens = np.fromiter((len(t) for t in token_id_lists), np.int64, n_sent)
        pad = (1 if bos else 0) + (1 if eos else 0)
        full_lens = lens + pad
        # Flat token stream with per-sentence BOS/EOS, built without a
        # per-sentence Python loop: concatenate the raw tokens, then
        # scatter them past the BOS slots in one fancy-index assignment.
        T0 = int(full_lens.sum())
        flat = np.empty(T0, dtype=np.int64)
        starts = np.zeros(n_sent, dtype=np.int64)
        np.cumsum(full_lens[:-1], out=starts[1:])
        if bos:
            flat[starts] = self.bos_id
        if eos:
            flat[starts + full_lens - 1] = self.eos_id
        if len(token_id_lists) == 1:
            body = np.asarray(token_id_lists[0], dtype=np.int64)
        else:
            body = (
                np.concatenate(token_id_lists).astype(np.int64, copy=False)
                if any(lens)
                else np.empty(0, dtype=np.int64)
            )
        # positions of the body tokens: for sentence i they occupy
        # [starts[i]+bos, starts[i]+bos+lens[i])
        body_sent = np.repeat(np.arange(n_sent), lens)
        body_off = np.arange(len(body)) - np.repeat(
            np.concatenate(([0], np.cumsum(lens[:-1]))), lens
        )
        flat[starts[body_sent] + (1 if bos else 0) + body_off] = body

        T = len(flat)
        # Position within sentence (0-based).
        sent_idx = np.repeat(np.arange(n_sent), full_lens)
        pos_in_sent = np.arange(T) - starts[sent_idx]

        N = self.order
        # keys_n[t]: uint64 key of the n-gram ending at t (valid if enough
        # sentence-local history exists: pos_in_sent[t] >= n-1).
        flat_u = flat.astype(np.uint64)
        nk = self._native()
        if nk is not None:
            # compiled hot loop (native_kernel.py): probes + longest-match
            # + backoff charges in one GIL-free pass, bit-identical to the
            # numpy sweep below (raw-bits A/B in tests/test_native_kernel.py)
            if not return_tokens:
                # totals-only callers (the Spark scorer UDFs, benchmark_cli)
                # fold the per-sentence reduction into the same pass —
                # no T-sized outputs, no bincount epilogue
                sent_scores, sent_oov = nk.score_reduce(
                    flat_u, pos_in_sent, sent_idx, n_sent, bos,
                    stupid_backoff, LOG10_STUPID_ALPHA,
                )
                return sent_scores, sent_oov, lens + (1 if eos else 0)
            token_prob, k = nk.score(
                flat_u, pos_in_sent, stupid_backoff, LOG10_STUPID_ALPHA
            )
            return self._score_batch_tail(
                token_prob, k, flat, pos_in_sent, sent_idx,
                lens, n_sent, bos, eos, return_tokens,
            )
        found = np.zeros((N + 1, T), dtype=bool)
        bo_at = np.zeros((N + 1, T), dtype=np.float64)

        found[1] = True
        # longest-match tracking is incremental: k/token_prob overwrite
        # per order (same values the old (N+1,T) where/max +
        # take_along_axis produced, without the temporaries)
        k = np.ones(T, dtype=np.int64)
        token_prob = self.uni_prob[flat].astype(np.float64)
        bo_at[1] = self.uni_backoff[flat]

        key = flat_u.copy()
        for n in range(2, N + 1):
            shifted = np.zeros_like(flat_u)
            if T > n - 1:
                shifted[n - 1 :] = flat_u[: T - n + 1]
            key = combine_word_hash_vec(key, shifted)
            # ARPA suffix closure (the invariant the loader's blank
            # hallucination maintains, lm/search_hashed.cc:57-133, and
            # the reference's own lookup loop walks up through): an
            # order-n gram exists only if its (n-1)-suffix — the gram
            # ending at the same position — exists.  Gating on
            # found[n-1] skips probes that cannot hit; results are
            # bit-identical (A/B-pinned in tests/test_model_golden.py).
            valid = (pos_in_sent >= (n - 1)) & found[n - 1]
            ks = self.keys[n]
            table = self._ptable(n)
            if table is not None:
                # O(1)-probe fast path; probe only context-valid
                # positions, gather by the ORIGINAL sorted index so the
                # payloads are bit-identical to the searchsorted path
                idx_full = np.full(T, -1, dtype=np.int64)
                vvalid = np.flatnonzero(valid)
                idx_full[vvalid] = _probe_table(table, key[vvalid])
                hit = idx_full >= 0
                found[n] = hit
                if hit.any():
                    k[hit] = n
                    token_prob[hit] = self.probs[n][idx_full[hit]]
                    if n < N:
                        bo_at[n][hit] = self.backoffs[n][idx_full[hit]]
                continue
            idx = np.searchsorted(ks, key)
            idx_c = np.minimum(idx, len(ks) - 1) if len(ks) else idx
            hit = valid & (len(ks) > 0)
            if len(ks):
                hit &= ks[idx_c] == key
            found[n] = hit
            if hit.any():
                k[hit] = n
                token_prob[hit] = self.probs[n][idx_c[hit]]
                if n < N:
                    bo_at[n][hit] = self.backoffs[n][idx_c[hit]]

        # (k/token_prob already track the longest found order per
        # position — orders above the available context never set them.)

        # Backoff charges: sum of bo(ctx_m at t-1) for m in [k[t], L[t]]
        # where L[t] = min(pos_in_sent[t], N-1).
        L = np.minimum(pos_in_sent, N - 1)
        if stupid_backoff:
            n_skipped = np.maximum(L - (k - 1), 0)
            charge_at_t = None
            token_prob = token_prob + n_skipped * LOG10_STUPID_ALPHA
        else:
            cs = np.cumsum(bo_at, axis=0)  # cs[n] = sum of bo_at[1..n]
            # charge[t] = cs[L[t], t-1] - cs[k[t]-1, t-1]
            prev = np.maximum(np.arange(T) - 1, 0)
            hi = np.take_along_axis(cs[:, prev], L.reshape(1, -1), axis=0)[0]
            lo = np.take_along_axis(cs[:, prev], (k - 1).reshape(1, -1), axis=0)[0]
            charge = hi - lo
            charge[pos_in_sent == 0] = 0.0
            token_prob = token_prob + charge

        return self._score_batch_tail(
            token_prob, k, flat, pos_in_sent, sent_idx,
            lens, n_sent, bos, eos, return_tokens,
        )

    def _score_batch_tail(
        self, token_prob, k, flat, pos_in_sent, sent_idx,
        lens, n_sent, bos, eos, return_tokens,
    ):
        """Shared epilogue of :meth:`score_batch` (numpy and native
        paths): mask the leading BOS, reduce per sentence."""
        T = len(flat)
        # Score every position except a leading BOS.
        scored = pos_in_sent > 0 if bos else np.ones(T, dtype=bool)
        contrib = np.where(scored, token_prob, 0.0)
        sent_scores = np.bincount(sent_idx, weights=contrib, minlength=n_sent)
        oov = np.where(scored & (flat == 0), 1, 0)
        sent_oov = np.bincount(sent_idx, weights=oov, minlength=n_sent).astype(
            np.int64
        )
        n_scored = lens + (1 if eos else 0)
        if return_tokens:
            detail = (
                token_prob[scored],
                k[scored].astype(np.int64),
                (flat[scored] == 0),
                sent_idx[scored],
            )
            return sent_scores, sent_oov, n_scored, detail
        return sent_scores, sent_oov, n_scored

    def score_id_stream(
        self, ids: np.ndarray, stupid_backoff: bool = False
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score a flat EOS-delimited id stream (the reference's
        kenlm_benchmark -q layout, lm/kenlm_benchmark_main.cc): every
        run of ids up to and including an ``eos_id`` marker is one
        sentence scored with bos=True, eos=True.  A trailing fragment
        without EOS is scored bos=True, eos=False.

        Identical results to splitting the stream and calling
        :meth:`score_batch` (regression-pinned raw-bits), but the flat
        token array and per-position metadata are built with O(T)
        vectorized scatters directly from the stream — no per-sentence
        views, no list-of-arrays concatenate, no Python chunk loop —
        which matters when sentences are short (captions average ~3
        queries: the per-sentence Python bookkeeping used to cost more
        than the compiled kernel itself).

        Returns (sent_scores, sent_oov, n_scored) per sentence
        (fragment last, if any).
        """
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        eos = self.eos_id
        is_eos = ids == eos
        n_full = int(is_eos.sum())
        n_ids = len(ids)
        has_frag = n_full == 0 or (n_ids and not is_eos[-1])
        if n_ids == 0:
            z = np.zeros(0)
            return z, z.astype(np.int64), z.astype(np.int64)
        # sentence index per stream element; BOS slots are inserted,
        # shifting element j right by (sentences before j) + 1
        sent_of = np.zeros(n_ids, dtype=np.int64)
        np.cumsum(is_eos[:-1], out=sent_of[1:])
        target = np.arange(n_ids) + sent_of + 1
        n_sent = n_full + (1 if has_frag else 0)
        T = n_ids + n_sent
        flat = np.empty(T, dtype=np.int64)
        flat[target] = ids
        starts = np.zeros(n_sent, dtype=np.int64)
        # sentence i starts right after sentence i-1's last element
        ends = target[np.flatnonzero(is_eos)]
        starts[1:n_full + (1 if has_frag else 0)] = (ends + 1)[
            : n_sent - 1
        ]
        flat[starts] = self.bos_id
        pos_in_sent = np.arange(T) - starts[
            np.repeat(np.arange(n_sent), np.diff(np.append(starts, T)))
        ]
        sent_idx = np.repeat(
            np.arange(n_sent), np.diff(np.append(starts, T))
        )
        nk = self._native()
        if nk is not None:
            sent_scores, sent_oov = nk.score_reduce(
                flat.astype(np.uint64), pos_in_sent, sent_idx, n_sent,
                True, stupid_backoff, LOG10_STUPID_ALPHA,
            )
            n_scored = np.diff(np.append(starts, T)) - 1
            return sent_scores, sent_oov, n_scored
        # numpy fallback: split into per-sentence views (the legacy path)
        bounds = np.flatnonzero(is_eos)
        lists = []
        prev = 0
        for p in bounds:
            lists.append(ids[prev:p])
            prev = p + 1
        s1 = o1 = n1 = None
        if lists:
            s1, o1, n1 = self.score_batch(lists, bos=True, eos=True,
                                          stupid_backoff=stupid_backoff)
        if has_frag:
            s2, o2, n2 = self.score_batch([ids[prev:]], bos=True, eos=False,
                                          stupid_backoff=stupid_backoff)
            if lists:
                return (np.concatenate([s1, s2]),
                        np.concatenate([o1, o2]),
                        np.concatenate([n1, n2]))
            return s2, o2, n2
        return s1, o1, n1

    def score_id_stream_total(
        self, ids: np.ndarray, stupid_backoff: bool = False
    ) -> float:
        """Total log10 prob of an EOS-delimited id stream — the
        benchmark_cli hot path.  With the compiled kernel this is ONE C
        call over the raw stream (virtual per-sentence BOS, zero
        Python-side construction); otherwise it sums
        :meth:`score_id_stream`.  The two differ only in float
        summation GROUPING across sentences (sequential vs per-sentence
        then np.sum), i.e. low-bit rounding on the grand total."""
        nk = self._native()
        if nk is not None:
            total, _ = nk.score_eos_stream_total(
                np.ascontiguousarray(ids, dtype=np.int64),
                self.eos_id,
                self.bos_id,
                stupid_backoff,
                LOG10_STUPID_ALPHA,
            )
            return total
        s, _, _ = self.score_id_stream(ids, stupid_backoff=stupid_backoff)
        return float(np.sum(s))

    def perplexity_batch(
        self, token_id_lists: list[np.ndarray], stupid_backoff: bool = False
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-sentence (perplexity, log10_prob, oov_count) with bos+eos."""
        scores, oov, n_scored = self.score_batch(
            token_id_lists, bos=True, eos=True, stupid_backoff=stupid_backoff
        )
        denom = np.maximum(n_scored, 1)
        ppl = np.power(10.0, -scores / denom)
        return ppl, scores, oov

    def map_ids(self, tokens: list[str]) -> np.ndarray:
        get = self.vocab.get
        return np.fromiter((get(t, 0) for t in tokens), np.int64, len(tokens))
