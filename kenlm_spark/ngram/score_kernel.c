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
