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
/* ---- MurmurHash64A (public domain, Austin Appleby) — the repo's shared
 * vocab hash (hashing.py murmur_hash64a, util/murmur_hash.cc twin). */
#define MURMUR_M 0xC6A4A7935BD1E995ULL
#define MURMUR_R 47

static uint64_t murmur64a(const uint8_t *data, int64_t len, uint64_t seed) {
    uint64_t h = seed ^ ((uint64_t)len * MURMUR_M);
    int64_t nb = len >> 3, i;
    for (i = 0; i < nb; i++) {
        uint64_t k;
        const uint8_t *p = data + (i << 3);
        k = (uint64_t)p[0] | (uint64_t)p[1] << 8 | (uint64_t)p[2] << 16 |
            (uint64_t)p[3] << 24 | (uint64_t)p[4] << 32 |
            (uint64_t)p[5] << 40 | (uint64_t)p[6] << 48 |
            (uint64_t)p[7] << 56;
        k *= MURMUR_M;
        k ^= k >> MURMUR_R;
        k *= MURMUR_M;
        h ^= k;
        h *= MURMUR_M;
    }
    {
        const uint8_t *tail = data + (nb << 3);
        int64_t rem = len & 7;
        if (rem) {
            uint64_t k = 0;
            int64_t j;
            for (j = 0; j < rem; j++) k |= (uint64_t)tail[j] << (8 * j);
            h ^= k;
            h *= MURMUR_M;
        }
    }
    h ^= h >> MURMUR_R;
    h *= MURMUR_M;
    h ^= h >> MURMUR_R;
    return h;
}

/* Hash each word (offsets[i]..offsets[i+1] bytes of buf) — used once per
 * process to build the vocab probing table in native_kernel.py. */
void hash_words(const uint8_t *buf, const int64_t *offsets, int64_t n,
                uint64_t *out) {
    int64_t i;
    for (i = 0; i < n; i++)
        out[i] = murmur64a(buf + offsets[i], offsets[i + 1] - offsets[i], 0);
}

#define IS_DELIM(b) ((b) == 0 || (b) == '\t' || (b) == '\n' || \
                     (b) == '\r' || (b) == ' ')

/* Fused caption scorer — the production quality-filter hot path: for
 * each caption (bytes buf[offsets[i]..offsets[i+1])), tokenize on the
 * repo's exact delimiter set (all 5 are ASCII, so the byte walk equals
 * the unicode regex split), map each token to its id through a
 * MurmurHash64A-keyed probing vocab (the reference's own vocab design,
 * util/probing_hash_table.hh; a miss is <unk>=0), and score
 * bos=True/eos=True — all in one pass, nothing Python-side.  Only the
 * last 15 ids are needed for the hash recurrence, so a 16-slot ring
 * replaces the id arrays entirely.  Emits per caption: log10 score,
 * OOV count, body token count. */
void score_captions(
    const uint8_t *buf, const int64_t *offsets, int64_t n_cap,
    const uint64_t *vkeys, const int64_t *vids, uint64_t vmask,
    uint64_t bos_id, uint64_t eos_id,
    int32_t N,
    const float *uni_prob, const float *uni_backoff,
    const uint64_t **keys, const int64_t *nkeys,
    const uint64_t **tkeys, const int64_t **tidx, const uint64_t *masks,
    const float **probs, const float **backoffs,
    int32_t stupid, double log10_alpha,
    double *out_scores, int64_t *out_oov, int64_t *out_ntok)
{
    uint64_t ring[16];
    double bo_prev[MAX_ORDER], bo_cur[MAX_ORDER];
    int64_t i;
    for (i = 0; i < n_cap; i++) {
        const uint8_t *s = buf + offsets[i];
        int64_t slen = offsets[i + 1] - offsets[i], pos = 0;
        double acc = 0.0;
        int64_t oov = 0, ntok = 0, p = 0;
        int32_t m, nn;
        int64_t tok_start;
        for (m = 0; m < MAX_ORDER; m++) bo_prev[m] = 0.0;
        ring[0] = bos_id;
        /* p = 0: the BOS position (unscored, charges next position) */
        /* then one position per token, then the EOS position */
        for (;;) {
            uint64_t w;
            int at_eos = 0;
            if (p == 0) {
                w = bos_id;
            } else {
                while (pos < slen && IS_DELIM(s[pos])) pos++;
                if (pos >= slen) {
                    w = eos_id;
                    at_eos = 1;
                } else {
                    uint64_t h;
                    int64_t idx;
                    tok_start = pos;
                    while (pos < slen && !IS_DELIM(s[pos])) pos++;
                    h = murmur64a(s + tok_start, pos - tok_start, 0);
                    idx = vkeys != 0
                              ? lookup_probe(vkeys, vids, vmask, h)
                              : -1;
                    w = idx >= 0 ? (uint64_t)idx : 0;
                    ntok++;
                    if (w == 0) oov++;
                }
                ring[p & 15] = w;
            }
            {
                double pr = (double)uni_prob[w];
                int32_t kk = 1;
                uint64_t key = w;
                int32_t maxn = (p + 1 < (int64_t)N) ? (int32_t)(p + 1) : N;
                for (m = 1; m < N; m++) bo_cur[m] = 0.0;
                bo_cur[1] = (double)uni_backoff[w];
                for (nn = 2; nn <= maxn; nn++) {
                    int64_t idx;
                    uint64_t ctx = ring[(p - nn + 1) & 15];
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
                    if (skipped > 0)
                        pr = pr + (double)skipped * log10_alpha;
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
                if (p > 0) acc = acc + pr;
                for (m = 1; m < N; m++) bo_prev[m] = bo_cur[m];
            }
            if (at_eos) break;
            p++;
        }
        out_scores[i] = acc;
        out_oov[i] = oov;
        out_ntok[i] = ntok;
    }
}

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
