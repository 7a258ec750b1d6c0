/* Compiled scorer hot loop — the single-thread twin of
 * NGramModel.score_batch's per-order numpy sweep (model.py), built from
 * public knowledge of the reference's query layer semantics
 * (lm/search_hashed.hh probing layout, lm/model.cc backoff charging):
 * per position, walk the n-gram hash recurrence up through the model
 * order, probe the per-order open-addressing table (or binary-search the
 * sorted key array below the probing threshold), track the longest hit,
 * and charge the backoffs of the skipped context orders.
 *
 * Bit-identity contract with the numpy path (A/B-pinned in
 * tests/test_model_golden.py):
 *   - payloads are float32 widened to double exactly;
 *   - the backoff charge replicates np.cumsum's sequential double adds
 *     (cs[m] = cs[m-1] + bo_prev[m]) and the hi - lo subtraction;
 *   - probe order and the empty=0 sentinel match _build_probing_table /
 *     _probe_table; binary search is leftmost (np.searchsorted).
 *
 * Compiled on demand per process by native_kernel.py (cc -O3 -shared);
 * every call releases the GIL (plain ctypes), so 32 executor threads
 * score concurrently without serializing on the interpreter.
 */
#include <stdint.h>

#define COMBINE_MUL 8978948897894561157ULL
#define WORD_MUL   17894857484156487943ULL
#define MAX_ORDER 16

static int64_t lookup_probe(const uint64_t *tkeys, const int64_t *tidx,
                            uint64_t mask, uint64_t key) {
    if (key == 0) return -1; /* 0 is the empty-bucket sentinel */
    uint64_t pos = key & mask;
    for (;;) {
        uint64_t v = tkeys[pos];
        if (v == key) return tidx[pos];
        if (v == 0) return -1;
        pos = (pos + 1) & mask;
    }
}

static int64_t lookup_bsearch(const uint64_t *keys, int64_t n, uint64_t key) {
    int64_t lo = 0, hi = n; /* leftmost insertion point, == searchsorted */
    while (lo < hi) {
        int64_t mid = lo + ((hi - lo) >> 1);
        if (keys[mid] < key) lo = mid + 1; else hi = mid;
    }
    if (lo < n && keys[lo] == key) return lo;
    return -1;
}

/* token_prob_out / k_out may be NULL when only the per-sentence
 * reduction is wanted; sent_scores / sent_oov may be NULL when only
 * per-token detail is wanted.  The reduction accumulates in position
 * order — exactly np.bincount's sequential adds over
 * where(scored, token_prob, 0.0) (the skipped +0.0 adds are identities:
 * the accumulator starts at +0.0 and can never become -0.0). */
/* Walk a raw EOS-delimited id stream with a VIRTUAL BOS at each
 * sentence start — no materialized flat array at all (the
 * kenlm_benchmark -q hot path: the whole timed region is this one
 * call).  Each run of ids up to and including eos_id is one sentence
 * scored bos=True (EOS is a literal stream element, so eos=True is
 * implied by the data); a trailing fragment scores bos=True/eos=False.
 * Bit-identical to building the flat stream and calling score_stream:
 * same per-position math, same accumulation order.  Returns the number
 * of sentences; *total_out = sum of all sentence log10 probs. */
int64_t score_eos_stream(
    const uint64_t *ids, int64_t n, uint64_t eos_id, uint64_t bos_id,
    int32_t N,
    const float *uni_prob, const float *uni_backoff,
    const uint64_t **keys, const int64_t *nkeys,
    const uint64_t **tkeys, const int64_t **tidx, const uint64_t *masks,
    const float **probs, const float **backoffs,
    int32_t stupid, double log10_alpha,
    double *total_out)
{
    double bo_prev[MAX_ORDER], bo_cur[MAX_ORDER];
    double total = 0.0;
    int64_t n_sent = 0, s_start = 0;
    int32_t m, nn;
    while (s_start < n) {
        /* sentence body = ids[s_start .. end), where ids[end-1] may be
         * eos; positions: 0 = virtual BOS, p >= 1 = ids[s_start+p-1] */
        const uint64_t *base = ids + s_start;
        int64_t len = 0;
        while (s_start + len < n && base[len] != eos_id) len++;
        if (s_start + len < n) len++; /* include the EOS element */
        for (m = 0; m < MAX_ORDER; m++) bo_prev[m] = 0.0;
        {
            int64_t p;
            for (p = 0; p <= len; p++) {
                uint64_t w = (p == 0) ? bos_id : base[p - 1];
                double pr = (double)uni_prob[w];
                int32_t kk = 1;
                uint64_t key = w;
                int32_t maxn = (p + 1 < (int64_t)N) ? (int32_t)(p + 1) : N;
                for (m = 1; m < N; m++) bo_cur[m] = 0.0;
                bo_cur[1] = (double)uni_backoff[w];
                for (nn = 2; nn <= maxn; nn++) {
                    int64_t idx, q = p - nn + 1;
                    uint64_t ctx = (q == 0) ? bos_id : base[q - 1];
                    key = key * COMBINE_MUL ^ (1ULL + ctx) * WORD_MUL;
                    idx = tkeys[nn] != 0
                              ? lookup_probe(tkeys[nn], tidx[nn],
                                             masks[nn], key)
                              : lookup_bsearch(keys[nn], nkeys[nn], key);
                    if (idx < 0) break;
                    kk = nn;
                    pr = (double)probs[nn][idx];
                    if (nn < N) bo_cur[nn] = (double)backoffs[nn][idx];
                }
                if (stupid) {
                    int32_t L = (p < (int64_t)(N - 1)) ? (int32_t)p : N - 1;
                    int64_t skipped = (int64_t)L - (int64_t)(kk - 1);
                    if (skipped > 0) pr = pr + (double)skipped * log10_alpha;
                } else {
                    int32_t L = (p < (int64_t)(N - 1)) ? (int32_t)p : N - 1;
                    double cs = 0.0, hi = 0.0, lo = 0.0, charge = 0.0;
                    if (p > 0) {
                        for (m = 1; m <= L; m++) {
                            cs = cs + bo_prev[m];
                            if (m == kk - 1) lo = cs;
                            if (m == L) hi = cs;
                        }
                        charge = hi - lo;
                    }
                    pr = pr + charge;
                }
                if (p > 0) total = total + pr; /* BOS never scored */
                for (m = 1; m < N; m++) bo_prev[m] = bo_cur[m];
            }
        }
        n_sent++;
        s_start += len; /* len >= 1 whenever s_start < n */
    }
    *total_out = total;
    return n_sent;
}

void score_stream(
    const uint64_t *flat, const int64_t *pos_in_sent, int64_t T, int32_t N,
    const float *uni_prob, const float *uni_backoff,
    const uint64_t **keys, const int64_t *nkeys,
    const uint64_t **tkeys, const int64_t **tidx, const uint64_t *masks,
    const float **probs, const float **backoffs,
    int32_t stupid, double log10_alpha,
    const int64_t *sent_idx, int32_t bos,
    double *sent_scores, int64_t *sent_oov,
    double *token_prob_out, int64_t *k_out)
{
    double bo_prev[MAX_ORDER]; /* previous position's bo_at[1..N-1] */
    double bo_cur[MAX_ORDER];
    int32_t m, n;
    int64_t t;
    for (m = 0; m < MAX_ORDER; m++) { bo_prev[m] = 0.0; bo_cur[m] = 0.0; }

    for (t = 0; t < T; t++) {
        uint64_t w = flat[t];
        int64_t pos = pos_in_sent[t];
        double p = (double)uni_prob[w];
        int32_t kk = 1;
        uint64_t key = w;
        int32_t maxn = (pos + 1 < (int64_t)N) ? (int32_t)(pos + 1) : N;
        for (m = 1; m < N; m++) bo_cur[m] = 0.0;
        bo_cur[1] = (double)uni_backoff[w];
        for (n = 2; n <= maxn; n++) {
            int64_t idx;
            key = key * COMBINE_MUL ^ (1ULL + flat[t - n + 1]) * WORD_MUL;
            idx = tkeys[n] != 0
                      ? lookup_probe(tkeys[n], tidx[n], masks[n], key)
                      : lookup_bsearch(keys[n], nkeys[n], key);
            /* ARPA suffix closure: an order-n miss means no higher order
             * can hit at this position (same gate as the numpy path). */
            if (idx < 0) break;
            kk = n;
            p = (double)probs[n][idx];
            if (n < N) bo_cur[n] = (double)backoffs[n][idx];
        }
        {
            int32_t L = (pos < (int64_t)(N - 1)) ? (int32_t)pos : N - 1;
            if (stupid) {
                /* numpy adds n_skipped*alpha unconditionally; at
                 * n_skipped == 0 that's p + (-0.0), an exact identity,
                 * so skipping the add is bit-identical. */
                int64_t skipped = (int64_t)L - (int64_t)(kk - 1);
                if (skipped > 0) p = p + (double)skipped * log10_alpha;
            } else {
                /* cs[m] = bo_prev[1] + ... + bo_prev[m], sequential double
                 * adds exactly like np.cumsum; charge = cs[L] - cs[kk-1].
                 * The add runs even at pos == 0 (charge +0.0) because the
                 * numpy path does — p + 0.0 maps -0.0 to +0.0. */
                double cs = 0.0, hi = 0.0, lo = 0.0, charge = 0.0;
                if (pos > 0) {
                    for (m = 1; m <= L; m++) {
                        cs = cs + bo_prev[m];
                        if (m == kk - 1) lo = cs;
                        if (m == L) hi = cs;
                    }
                    /* kk-1 == 0 leaves lo at cs[0] = 0 */
                    charge = hi - lo;
                }
                p = p + charge;
            }
        }
        if (token_prob_out) {
            token_prob_out[t] = p;
            k_out[t] = (int64_t)kk;
        }
        if (sent_scores) {
            int scored = bos ? (pos > 0) : 1;
            if (scored) {
                int64_t s = sent_idx[t];
                sent_scores[s] = sent_scores[s] + p;
                if (w == 0) sent_oov[s] += 1;
            }
        }
        for (m = 1; m < N; m++) bo_prev[m] = bo_cur[m];
    }
}
