/* Compiled kernels for the dictionary Viterbi tokenizers.
 *
 * Statement-for-statement replications of
 * ``lucene_kmp_spark/analysis/morph.py`` (``ViterbiLattice.forward`` /
 * ``_add`` — themselves ports of the reference's
 * ``analysis/common/.../morph/Viterbi.kt:49-325``), the two language
 * ``process_unknown`` hooks (``ja.py:81`` / ``ko.py:171``), the Korean
 * space penalty (``ko.py:165``), and — for ``lkm_tokenize_ja`` — the
 * whole Japanese search-mode backtrace: ``ja.py:183`` ``_backtrace``
 * with ``_prune_and_rescore`` (:283, KuromojiViterbiNBest.kt:136-389),
 * EOS selection (``morph.py best_end_index``), user-dictionary
 * segmentation splits, extended-mode unigrams and compound-alt
 * emission.
 *
 * Everything Unicode- or dictionary-shaped is table-driven; the caller
 * (``cmorph.py``) packs prefix dictionaries into open-addressing hash
 * tables, the connection matrix into a flat int32 row-major array, the
 * char.def / script ranges into arrays with persistent per-codepoint
 * memo tables, and a global per-codepoint flags byte (punctuation / Zs
 * / digit / Mn / Mn+Mc+Me) computed from Python's unicodedata so both
 * implementations read the same classification.  Tie-breaks keep the
 * FIRST minimum, exactly like the Python loops.
 *
 * Two entry points:
 *   lkm_forward     — build the lattice, export arcs grouped by end
 *                     position (Korean tokenize + Japanese n-best read
 *                     it through a lazily materialised positions dict).
 *   lkm_tokenize_ja — forward + backtrace entirely in C; emits token
 *                     records (start, end, type, word_id, poslen) in
 *                     the exact Python ``pending`` append order.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define CF_PUNCT 1u
#define CF_ZS 2u
#define CF_DIGIT 4u
#define CF_MN 8u
#define CF_MCME 16u

#define TYPE_KNOWN 0
#define TYPE_UNKNOWN 1
#define TYPE_USER 2

#define FLAG_LANG_KO 1
#define FLAG_ALWAYS_UNKNOWN 2      /* ja search_mode: never skip unknowns */
#define FLAG_SPACE_PENALTY 4       /* enable_space_penalty (ko) */
#define FLAG_LONGEST_USER 8        /* output_longest_user_only */
#define FLAG_SEARCH 16             /* ja search_mode (backtrace penalties) */
#define FLAG_EXTENDED 32           /* ja extended_mode unigrams */
#define FLAG_DISCARD_PUNCT 64
#define FLAG_OUT_COMPOUNDS 128

/* KuromojiViterbiNBest.kt:44-47 (ja.py:48-51) */
#define KANJI_LEN 2
#define OTHER_LEN 7
#define KANJI_PEN 3000
#define OTHER_PEN 1700

typedef struct {
    const uint32_t *blob;
    const int32_t *t_keyoff;  /* per slot: offset into blob, -1 = empty */
    const int32_t *t_keylen;
    const int32_t *t_idsoff;
    const int32_t *t_idslen;
    const int32_t *ids;
    const int32_t *lengths;   /* distinct surface lengths, ascending */
    int32_t n_lengths;
    int64_t cap_mask;         /* table_size-1; <0 -> no dict */
    const int32_t *left_id;
    const int32_t *right_id;
    const int32_t *word_cost;
    const uint8_t *space_flag;
    const int32_t *seg_off;   /* user dict: segmentation slices, else NULL */
    const int32_t *seg_len;
    const int32_t *seg;
    const uint8_t *ptype;     /* 0 MORPHEME, 1 COMPOUND, 2 INFLECT, 3 PREANALYSIS */
    const int32_t *m_off;     /* per entry: slice of m_lens[] (codepoint */
    const int32_t *m_cnt;     /* lengths of the decompound morpheme surfaces) */
    const int32_t *m_lens;
} Dict;

typedef struct {
    const int32_t *lo;
    const int32_t *hi;
    const int16_t *cls;
    int32_t n_ranges;
    int16_t default_cls;
    int16_t kanji_cls;        /* class id of "KANJI", -1 if absent */
    const uint8_t *invoke;
    const uint8_t *group;
    int16_t *memo;            /* 0x110000, -1 init, persists across calls */
} CharDef;

typedef struct {
    const int32_t *lo;
    const int32_t *hi;
    const int16_t *id;        /* COMMON=0, INHERITED=1, others >=2 */
    int32_t n;
    int16_t *memo;
} ScriptTab;

typedef struct {
    const int32_t *off;       /* per char-class id: slice of ids[] */
    const int32_t *len;
    const int32_t *ids;       /* flattened unknown-entry ids */
    const int32_t *left_id;
    const int32_t *right_id;
    const int32_t *word_cost;
    const uint8_t *space_flag;
    const uint8_t *ptype;
    const int32_t *m_off;
    const int32_t *m_cnt;
    const int32_t *m_lens;
} UnkPack;

typedef struct {
    int64_t *cost;
    int32_t *last_right;
    int32_t *back_pos;
    int32_t *back_word_pos;
    int32_t *back_index;
    int32_t *back_id;
    int8_t *back_type;
    int32_t *pos_off;         /* n+2 entries */
    int64_t capacity;
} Out;

typedef struct {
    int32_t *start;
    int32_t *end;
    int32_t *word_id;
    int32_t *poslen;
    int8_t *type;
    int8_t *posinc;
    int32_t *midx;            /* decompound morpheme index, -1 = whole entry */
    int64_t capacity;
} TokOut;

typedef struct {
    int64_t cost;
    int32_t last_right, back_pos, back_word_pos, back_index, back_id, next;
    int8_t type;
} Arc;

typedef struct {                    /* _Pos.forward entries (ja.py:211) */
    int32_t to_pos, word_id, next;
    int8_t type;
} FArc;

typedef struct {
    const uint32_t *text;
    int32_t n;
    const Dict *known, *user;
    const int32_t *conn;
    int32_t n_ctx;
    const CharDef *cd;
    const ScriptTab *st;
    const uint8_t *cf;
    const UnkPack *unk;
    int32_t flags;
    Arc *pool;
    int64_t pool_len, pool_cap;
    int32_t *head, *tail;           /* per position, -1 = empty */
    FArc *fpool;
    int64_t fpool_len, fpool_cap;
    int32_t *fhead, *ftail;
    int oom;
} Ctx;

static uint64_t fnv1a(const uint32_t *cps, int32_t len) {
    uint64_t h = 0xcbf29ce484222325ULL;
    for (int32_t i = 0; i < len; i++) {
        uint32_t v = cps[i];
        for (int k = 0; k < 4; k++) {
            h ^= (v >> (8 * k)) & 0xffu;
            h *= 0x100000001b3ULL;
        }
    }
    return h;
}

static int16_t char_class(const CharDef *cd, uint32_t cp) {
    int16_t c = cd->memo[cp];
    if (c < 0) {
        c = cd->default_cls;
        for (int32_t i = 0; i < cd->n_ranges; i++) {
            if (cd->lo[i] <= (int32_t)cp && (int32_t)cp <= cd->hi[i]) {
                c = cd->cls[i];
                break;
            }
        }
        cd->memo[cp] = c;
    }
    return c;
}

static int16_t script_of(const ScriptTab *st, const uint8_t *cf, uint32_t cp) {
    int16_t s = st->memo[cp];
    if (s < 0) {
        s = -1;
        for (int32_t i = 0; i < st->n; i++) {
            if (st->lo[i] <= (int32_t)cp && (int32_t)cp <= st->hi[i]) {
                s = st->id[i];
                break;
            }
        }
        if (s < 0)
            s = (cf[cp] & CF_MCME) ? 1 /* INHERITED */ : 0 /* COMMON */;
        st->memo[cp] = s;
    }
    return s;
}

/* entry attribute accessors across the three pools */
static int32_t ent_left(const Ctx *c, int32_t id, int8_t t) {
    return t == TYPE_KNOWN ? c->known->left_id[id]
         : t == TYPE_USER ? c->user->left_id[id] : c->unk->left_id[id];
}
static int32_t ent_right(const Ctx *c, int32_t id, int8_t t) {
    return t == TYPE_KNOWN ? c->known->right_id[id]
         : t == TYPE_USER ? c->user->right_id[id] : c->unk->right_id[id];
}
static int32_t ent_cost(const Ctx *c, int32_t id, int8_t t) {
    return t == TYPE_KNOWN ? c->known->word_cost[id]
         : t == TYPE_USER ? c->user->word_cost[id] : c->unk->word_cost[id];
}

static Arc *arc_at(const Ctx *c, int32_t pos, int32_t idx) {
    int32_t ai = c->head[pos];
    while (idx-- > 0) ai = c->pool[ai].next;
    return &c->pool[ai];
}

static int add_arc(Ctx *c, int32_t end_pos, int64_t cost, int32_t last_right,
                   int32_t back_pos, int32_t back_word_pos, int32_t back_index,
                   int32_t back_id, int8_t type) {
    if (c->pool_len == c->pool_cap) {
        int64_t ncap = c->pool_cap * 2;
        Arc *np = (Arc *)realloc(c->pool, (size_t)ncap * sizeof(Arc));
        if (!np) { c->oom = 1; return -1; }
        c->pool = np;
        c->pool_cap = ncap;
    }
    Arc *a = &c->pool[c->pool_len];
    a->cost = cost; a->last_right = last_right; a->back_pos = back_pos;
    a->back_word_pos = back_word_pos; a->back_index = back_index;
    a->back_id = back_id; a->type = type; a->next = -1;
    int32_t idx = (int32_t)c->pool_len++;
    if (c->head[end_pos] < 0) c->head[end_pos] = idx;
    else c->pool[c->tail[end_pos]].next = idx;
    c->tail[end_pos] = idx;
    return 0;
}

static int fadd(Ctx *c, int32_t at_pos, int32_t to_pos, int32_t word_id,
                int8_t type) {
    if (c->fpool_len == c->fpool_cap) {
        int64_t ncap = c->fpool_cap ? c->fpool_cap * 2 : 256;
        FArc *np = (FArc *)realloc(c->fpool, (size_t)ncap * sizeof(FArc));
        if (!np) { c->oom = 1; return -1; }
        c->fpool = np;
        c->fpool_cap = ncap;
    }
    FArc *f = &c->fpool[c->fpool_len];
    f->to_pos = to_pos; f->word_id = word_id; f->type = type; f->next = -1;
    int32_t idx = (int32_t)c->fpool_len++;
    if (c->fhead[at_pos] < 0) c->fhead[at_pos] = idx;
    else c->fpool[c->ftail[at_pos]].next = idx;
    c->ftail[at_pos] = idx;
    return 0;
}

/* ja.py:66 computePenalty (KuromojiViterbiNBest.kt:69-85) */
static int32_t penalty_ja(const Ctx *c, int32_t pos, int32_t length) {
    if (length > KANJI_LEN) {
        if (c->cd->kanji_cls >= 0) {
            int allk = 1;
            for (int32_t i = 0; i < length; i++)
                if (char_class(c->cd, c->text[pos + i]) != c->cd->kanji_cls) {
                    allk = 0;
                    break;
                }
            if (allk) return (length - KANJI_LEN) * KANJI_PEN;
        }
        if (length > OTHER_LEN) return (length - OTHER_LEN) * OTHER_PEN;
    }
    return 0;
}

/* morph.py _add (Viterbi.kt:284-325).  add_pen mirrors the add_penalty
 * flag used only by prune-and-rescore's non-seed branch. */
static int relax(Ctx *c, int32_t word_id, int8_t type, int32_t from_pos,
                 int32_t word_pos, int32_t end_pos, int add_pen) {
    int32_t left = ent_left(c, word_id, type);
    const int32_t *col = c->conn + left;
    int32_t stride = c->n_ctx;
    int32_t ai = c->head[from_pos];
    Arc *p0 = &c->pool[ai];
    int64_t least = p0->cost + col[(int64_t)p0->last_right * stride];
    int32_t least_idx = 0, idx = 0;
    for (ai = p0->next; ai >= 0; ai = c->pool[ai].next) {
        idx++;
        Arc *a = &c->pool[ai];
        int64_t cost = a->cost + col[(int64_t)a->last_right * stride];
        if (cost < least) { least = cost; least_idx = idx; }
    }
    int32_t num_spaces = word_pos - from_pos;
    if (num_spaces > 0 && (c->flags & FLAG_LANG_KO)) {
        const uint8_t *sf = type == TYPE_KNOWN ? c->known->space_flag
                          : type == TYPE_USER ? c->user->space_flag
                          : c->unk->space_flag;
        if (sf[word_id]) least += 3000;       /* ko.py:165-169 */
    }
    least += ent_cost(c, word_id, type);
    if (add_pen && type != TYPE_USER)
        least += penalty_ja(c, from_pos, end_pos - from_pos);
    return add_arc(c, end_pos, least, ent_right(c, word_id, type), from_pos,
                   word_pos, least_idx, word_id, type);
}

static int probe(const Ctx *c, const Dict *d, int32_t pos, int32_t L,
                 const int32_t **ids, int32_t *n_ids) {
    uint64_t h = fnv1a(c->text + pos, L);
    int64_t slot = (int64_t)(h & (uint64_t)d->cap_mask);
    while (d->t_keyoff[slot] >= 0) {
        if (d->t_keylen[slot] == L &&
            !memcmp(d->blob + d->t_keyoff[slot], c->text + pos,
                    (size_t)L * 4)) {
            *ids = d->ids + d->t_idsoff[slot];
            *n_ids = d->t_idslen[slot];
            return 1;
        }
        slot = (slot + 1) & d->cap_mask;
    }
    return 0;
}

/* ja.py:81 processUnknownWord */
static int32_t unknown_ja(Ctx *c, int32_t pos, int32_t pd_pos, int any) {
    uint32_t first = c->text[pos];
    int16_t cls = char_class(c->cd, first);
    if (any && !c->cd->invoke[cls]) return 0;
    int32_t length = 1;
    if (c->cd->group[cls]) {
        unsigned punct = c->cf[first] & CF_PUNCT;
        while (length < 1024 && pos + length < c->n) {
            uint32_t ch = c->text[pos + length];
            if (char_class(c->cd, ch) != cls) break;
            if ((c->cf[ch] & CF_PUNCT) != punct) break;
            length++;
        }
    }
    /* arcs end at pos_data.pos + length (ja.py:98) */
    const int32_t *uids = c->unk->ids + c->unk->off[cls];
    int32_t un = c->unk->len[cls];
    for (int32_t i = 0; i < un; i++)
        if (relax(c, uids[i], TYPE_UNKNOWN, pd_pos, pos, pd_pos + length, 0))
            return -1;
    return length;
}

/* ko.py:171 processUnknownWord (nori Viterbi.kt:57-108) */
static int32_t unknown_ko(Ctx *c, int32_t pos, int32_t pd_pos, int any) {
    uint32_t first = c->text[pos];
    int16_t cls = char_class(c->cd, first);
    if (any && !c->cd->invoke[cls]) return 0;
    int32_t length = 1;
    if (c->cd->group[cls]) {
        int16_t script = script_of(c->st, c->cf, first);
        unsigned punct = c->cf[first] & CF_PUNCT;
        unsigned digit = c->cf[first] & CF_DIGIT;
        while (length < 1024 && pos + length < c->n) {
            uint32_t ch = c->text[pos + length];
            int16_t sc = script_of(c->st, c->cf, ch);
            int same = (sc == script) || (script <= 1) || (sc <= 1) ||
                       (c->cf[ch] & CF_MN);
            int16_t chcls = char_class(c->cd, ch);
            if (same && ((c->cf[ch] & CF_PUNCT) == punct) &&
                ((c->cf[ch] & CF_DIGIT) == digit) && c->cd->group[chcls])
                length++;
            else
                break;
            if (script <= 1 && sc > 1) {   /* inherited adopts next script */
                script = sc;
                cls = chcls;
            }
        }
    }
    /* arcs end at pos + length (ko.py:204) */
    const int32_t *uids = c->unk->ids + c->unk->off[cls];
    int32_t un = c->unk->len[cls];
    for (int32_t i = 0; i < un; i++)
        if (relax(c, uids[i], TYPE_UNKNOWN, pd_pos, pos, pos + length, 0))
            return -1;
    return length;
}

/* morph.py:334 forward() main loop (Viterbi.kt:49-233) */
static int build_lattice(Ctx *c) {
    const uint32_t *text = c->text;
    int32_t n = c->n;
    add_arc(c, 0, 0, 0, -1, -1, -1, -1, TYPE_KNOWN);   /* BOS */
    int32_t unknown_end = -1, user_max_ahead = -1;
    int32_t pos = 0;
    while (pos < n && !c->oom) {
        if (c->head[pos] < 0) { pos++; continue; }
        int32_t pd = pos;                     /* pos_data.pos */

        if ((c->flags & FLAG_SPACE_PENALTY) && (c->cf[text[pos]] & CF_ZS)) {
            /* morph.py:343-355 (Viterbi.kt:139-143) */
            pos++;
            if (pos == n) pos = pd;
        }

        int any = 0;

        if (c->user->cap_mask >= 0) {
            const int32_t *m_ids[64]; int32_t m_n[64], m_len[64];
            int32_t hits = 0;
            for (int32_t li = 0; li < c->user->n_lengths; li++) {
                int32_t L = c->user->lengths[li];
                if (pos + L > n) break;
                const int32_t *ids; int32_t nids;
                if (probe(c, c->user, pos, L, &ids, &nids)) {
                    m_ids[hits] = ids; m_n[hits] = nids; m_len[hits] = L;
                    hits++;
                }
            }
            if (hits) {
                any = 1;
                if (c->flags & FLAG_LONGEST_USER) {
                    int32_t L = m_len[hits - 1];
                    int32_t id0 = m_ids[hits - 1][0];
                    if (pos + L - 1 > user_max_ahead) {
                        if (relax(c, id0, TYPE_USER, pd, pos, pos + L, 0))
                            return -1;
                        user_max_ahead = pos + L - 1;
                    }
                } else {
                    for (int32_t hI = 0; hI < hits; hI++)
                        for (int32_t j = 0; j < m_n[hI]; j++)
                            if (relax(c, m_ids[hI][j], TYPE_USER, pd, pos,
                                      pos + m_len[hI], 0))
                                return -1;
                }
            }
        }

        if (!any) {
            for (int32_t li = 0; li < c->known->n_lengths; li++) {
                int32_t L = c->known->lengths[li];
                if (pos + L > n) break;
                const int32_t *ids; int32_t nids;
                if (probe(c, c->known, pos, L, &ids, &nids)) {
                    for (int32_t j = 0; j < nids; j++)
                        if (relax(c, ids[j], TYPE_KNOWN, pd, pos, pos + L, 0))
                            return -1;
                    any = 1;
                }
            }
        }

        int skip = !(c->flags & FLAG_ALWAYS_UNKNOWN) && (unknown_end > pd);
        if (!skip) {
            int32_t ulen = (c->flags & FLAG_LANG_KO)
                               ? unknown_ko(c, pos, pd, any)
                               : unknown_ja(c, pos, pd, any);
            if (ulen < 0) return -1;
            if (ulen) unknown_end = pd + ulen;
        }
        pos++;
    }
    return c->oom ? -1 : 0;
}

static int ctx_init(Ctx *c, const uint32_t *text, int32_t n,
                    const Dict *known, const Dict *user, const int32_t *conn,
                    int32_t n_ctx, const CharDef *cd, const ScriptTab *st,
                    const uint8_t *charflags, const UnkPack *unk,
                    int32_t flags, int with_farcs) {
    memset(c, 0, sizeof(*c));
    c->text = text; c->n = n; c->known = known; c->user = user;
    c->conn = conn; c->n_ctx = n_ctx; c->cd = cd; c->st = st;
    c->cf = charflags; c->unk = unk; c->flags = flags;
    c->pool_cap = 4 * (int64_t)n + 64;
    c->pool = (Arc *)malloc((size_t)c->pool_cap * sizeof(Arc));
    c->head = (int32_t *)malloc((size_t)(n + 2) * sizeof(int32_t));
    c->tail = (int32_t *)malloc((size_t)(n + 2) * sizeof(int32_t));
    int ok = c->pool && c->head && c->tail;
    if (ok && with_farcs) {
        c->fhead = (int32_t *)malloc((size_t)(n + 2) * sizeof(int32_t));
        c->ftail = (int32_t *)malloc((size_t)(n + 2) * sizeof(int32_t));
        ok = c->fhead && c->ftail;
        if (ok)
            for (int32_t i = 0; i <= n + 1; i++) c->fhead[i] = c->ftail[i] = -1;
    }
    if (!ok) {
        free(c->pool); free(c->head); free(c->tail);
        free(c->fhead); free(c->ftail);
        return -1;
    }
    for (int32_t i = 0; i <= n + 1; i++) c->head[i] = c->tail[i] = -1;
    return 0;
}

static void ctx_free(Ctx *c) {
    free(c->pool); free(c->head); free(c->tail);
    free(c->fpool); free(c->fhead); free(c->ftail);
}

int64_t lkm_forward(const uint32_t *text, int32_t n, const Dict *known,
                    const Dict *user, const int32_t *conn, int32_t n_ctx,
                    const CharDef *cd, const ScriptTab *st,
                    const uint8_t *charflags, const UnkPack *unk,
                    int32_t flags, Out *out) {
    Ctx c;
    if (ctx_init(&c, text, n, known, user, conn, n_ctx, cd, st, charflags,
                 unk, flags, 0))
        return -1;
    if (build_lattice(&c)) { ctx_free(&c); return -1; }
    if (c.pool_len > out->capacity) { ctx_free(&c); return -2; }
    /* emit grouped by end position, per-position append order preserved */
    int64_t w = 0;
    for (int32_t p = 0; p <= n; p++) {
        out->pos_off[p] = (int32_t)w;
        for (int32_t ai = c.head[p]; ai >= 0; ai = c.pool[ai].next) {
            Arc *a = &c.pool[ai];
            out->cost[w] = a->cost;
            out->last_right[w] = a->last_right;
            out->back_pos[w] = a->back_pos;
            out->back_word_pos[w] = a->back_word_pos;
            out->back_index[w] = a->back_index;
            out->back_id[w] = a->back_id;
            out->back_type[w] = a->type;
            w++;
        }
    }
    out->pos_off[n + 1] = (int32_t)w;
    ctx_free(&c);
    return w;
}

/* ja.py:283 _prune_and_rescore (KuromojiViterbiNBest.kt:318-389) */
static int prune_and_rescore(Ctx *c, int32_t start, int32_t end,
                             int32_t best_start_idx) {
    for (int32_t pos = end; pos > start; pos--) {
        for (int32_t ai = c->head[pos]; ai >= 0; ai = c->pool[ai].next) {
            Arc *a = &c->pool[ai];
            if (a->back_pos >= start)
                if (fadd(c, a->back_pos, pos, a->back_id, a->type))
                    return -1;
        }
        c->head[pos] = c->tail[pos] = -1;     /* pos_data.reset() */
    }
    for (int32_t p2 = start; p2 < end; p2++) {
        if (c->head[p2] < 0 && p2 != start) {
            c->fhead[p2] = c->ftail[p2] = -1;
            continue;
        }
        if (p2 == start) {
            int32_t right_id = 0;
            Arc *seed = arc_at(c, p2, best_start_idx);
            if (start != 0)
                right_id = ent_right(c, seed->back_id, seed->type);
            int64_t path_cost = seed->cost;
            for (int32_t fi = c->fhead[p2]; fi >= 0; fi = c->fpool[fi].next) {
                FArc *f = &c->fpool[fi];
                /* seed branch applies the penalty unconditionally
                 * (ja.py:314-321) */
                int64_t nc = path_cost + ent_cost(c, f->word_id, f->type) +
                             c->conn[(int64_t)right_id * c->n_ctx +
                                     ent_left(c, f->word_id, f->type)] +
                             penalty_ja(c, p2, f->to_pos - p2);
                if (add_arc(c, f->to_pos, nc,
                            ent_right(c, f->word_id, f->type), p2, -1,
                            best_start_idx, f->word_id, f->type))
                    return -1;
            }
        } else {
            for (int32_t fi = c->fhead[p2]; fi >= 0; fi = c->fpool[fi].next) {
                FArc *f = &c->fpool[fi];
                if (relax(c, f->word_id, f->type, p2, p2, f->to_pos, 1))
                    return -1;
            }
        }
        c->fhead[p2] = c->ftail[p2] = -1;
    }
    return 0;
}

static int emit(const TokOut *out, int64_t *cnt, int32_t s, int32_t e,
                int8_t type, int32_t wid, int32_t poslen, int8_t posinc,
                int32_t midx) {
    if (*cnt >= out->capacity) return -1;
    out->start[*cnt] = s; out->end[*cnt] = e; out->type[*cnt] = type;
    out->word_id[*cnt] = wid; out->poslen[*cnt] = poslen;
    out->posinc[*cnt] = posinc; out->midx[*cnt] = midx;
    (*cnt)++;
    return 0;
}

/* ja.py:102 tokenize / :183 _backtrace, emitting records in the Python
 * ``pending`` append order (the caller reverses). */
int64_t lkm_tokenize_ja(const uint32_t *text, int32_t n, const Dict *known,
                        const Dict *user, const int32_t *conn, int32_t n_ctx,
                        const CharDef *cd, const uint8_t *charflags,
                        const UnkPack *unk, int32_t flags, TokOut *out) {
    static const ScriptTab no_scripts = {0, 0, 0, 0, 0};
    Ctx c;
    if (ctx_init(&c, text, n, known, user, conn, n_ctx, cd, &no_scripts,
                 charflags, unk, flags, 1))
        return -1;
    if (build_lattice(&c)) { ctx_free(&c); return -1; }

    /* best_end_index (morph.py:410): least cost + conn(last_right, 0) */
    if (c.head[n] < 0) { ctx_free(&c); return 0; }
    int64_t least = 0;
    int32_t least_idx = -1, idx = 0;
    for (int32_t ai = c.head[n]; ai >= 0; ai = c.pool[ai].next, idx++) {
        Arc *a = &c.pool[ai];
        int64_t cost = a->cost + c.conn[(int64_t)a->last_right * n_ctx];
        if (least_idx < 0 || cost < least) { least = cost; least_idx = idx; }
    }

    int64_t cnt = 0;
    int overflow = 0;
    int32_t pos = n, best_idx = least_idx;
    int alt_present = 0;
    int32_t alt_s = 0, alt_e = 0, alt_id = 0;
    int8_t alt_t = 0;
    int32_t last_left = -1, back_count = 0;
    int discard_punct = (flags & FLAG_DISCARD_PUNCT) != 0;

    while (pos > 0) {
        Arc *a = arc_at(&c, pos, best_idx);
        int32_t back_pos = a->back_pos;
        int32_t length = pos - back_pos;
        int8_t back_type = a->type;
        int32_t back_id = a->back_id;
        int32_t next_best_idx = a->back_index;

        if ((flags & FLAG_SEARCH) && !alt_present && back_type != TYPE_USER) {
            int32_t pen = penalty_ja(&c, back_pos, length);
            if (pen > 0) {
                int64_t max_cost = a->cost + pen;
                if (last_left != -1)
                    max_cost += c.conn[
                        (int64_t)ent_right(&c, back_id, back_type) * n_ctx +
                        last_left];
                if (prune_and_rescore(&c, back_pos, pos, a->back_index)) {
                    ctx_free(&c);
                    return -1;
                }
                /* re-pick the best arc over the rebuilt slice
                 * (ja.py:211-232) */
                int64_t least2 = 0;
                int32_t least2_idx = -1, i2 = 0;
                for (int32_t ai = c.head[pos]; ai >= 0;
                     ai = c.pool[ai].next, i2++) {
                    Arc *b = &c.pool[ai];
                    int64_t cost = b->cost;
                    if (last_left != -1)
                        cost += c.conn[
                            (int64_t)ent_right(&c, b->back_id, b->type) *
                                n_ctx + last_left];
                    if (least2_idx < 0 || cost < least2) {
                        least2 = cost;
                        least2_idx = i2;
                    }
                }
                if (least2_idx != -1 && least2 <= max_cost &&
                    arc_at(&c, pos, least2_idx)->back_pos != back_pos) {
                    alt_s = back_pos; alt_e = pos; alt_t = back_type;
                    alt_id = back_id; alt_present = 1;
                    best_idx = least2_idx;
                    a = arc_at(&c, pos, best_idx);
                    next_best_idx = a->back_index;
                    back_pos = a->back_pos;
                    length = pos - back_pos;
                    back_type = a->type;
                    back_id = a->back_id;
                    back_count = 0;
                }
            }
        }

        if (alt_present && alt_s >= back_pos) {
            if ((flags & FLAG_OUT_COMPOUNDS) && back_count > 0) {
                back_count += 1;
                if (emit(out, &cnt, alt_s, alt_e, alt_t, alt_id, back_count, 1, -1))
                    overflow = 1;
            }
            alt_present = 0;
        }

        if (back_type == TYPE_USER && user->seg_len[back_id] > 0) {
            /* UserDictionary.lookupSegmentation (ja.py:245-256): parts
             * appended in order then extended reversed into pending */
            int32_t soff = user->seg_off[back_id];
            int32_t nseg = user->seg_len[back_id];
            int32_t current = 0;
            /* prefix offsets for reversed emission */
            int32_t starts[64];
            for (int32_t i = 0; i < nseg && i < 64; i++) {
                starts[i] = back_pos + current;
                current += user->seg[soff + i];
            }
            for (int32_t i = nseg - 1; i >= 0; i--) {
                if (emit(out, &cnt, starts[i], starts[i] + user->seg[soff + i],
                         TYPE_USER, back_id, 1, 1, -1))
                    overflow = 1;
            }
            back_count += nseg;
        } else if ((flags & FLAG_EXTENDED) && back_type == TYPE_UNKNOWN) {
            int32_t i = length - 1;
            while (i >= 0) {
                int32_t char_len = 1;
                uint32_t chk = text[back_pos + i];
                if (i > 0 && chk >= 0xDC00 && chk <= 0xDFFF) {
                    i -= 1;
                    char_len = 2;
                }
                uint32_t ch = text[back_pos + i];
                if (!discard_punct || !(charflags[ch] & CF_PUNCT)) {
                    if (emit(out, &cnt, back_pos + i, back_pos + i + char_len,
                             TYPE_UNKNOWN, back_id, 1, 1, -1))
                        overflow = 1;
                    back_count += 1;
                }
                i -= 1;
            }
        } else if (!discard_punct || length == 0 ||
                   !(charflags[text[back_pos]] & CF_PUNCT)) {
            if (emit(out, &cnt, back_pos, pos, back_type, back_id, 1, 1, -1))
                overflow = 1;
            back_count += 1;
        }

        last_left = ent_left(&c, back_id, back_type);
        pos = back_pos;
        best_idx = next_best_idx;
    }

    ctx_free(&c);
    return overflow ? -2 : cnt;
}

/* ko.py:207 tokenize / :216 _backtrace (nori Viterbi.backtrace
 * :115-242), emitting records in the Python ``pending`` append order.
 * mode: 0 = NONE, 1 = DISCARD, 2 = MIXED.  Decompound parts reference
 * the owning entry via (word_id, midx); the caller builds the part
 * surfaces from entry.morphemes. */
static int32_t ent_ptype(const Ctx *c, int32_t id, int8_t t) {
    return t == TYPE_KNOWN ? c->known->ptype[id]
         : t == TYPE_USER ? c->user->ptype[id] : c->unk->ptype[id];
}

int64_t lkm_tokenize_ko(const uint32_t *text, int32_t n, const Dict *known,
                        const Dict *user, const int32_t *conn, int32_t n_ctx,
                        const CharDef *cd, const ScriptTab *st,
                        const uint8_t *charflags, const UnkPack *unk,
                        int32_t flags, int32_t mode, TokOut *out) {
    Ctx c;
    if (ctx_init(&c, text, n, known, user, conn, n_ctx, cd, st, charflags,
                 unk, flags, 0))
        return -1;
    if (build_lattice(&c)) { ctx_free(&c); return -1; }

    if (c.head[n] < 0) { ctx_free(&c); return 0; }
    int64_t least = 0;
    int32_t least_idx = -1, idx = 0;
    for (int32_t ai = c.head[n]; ai >= 0; ai = c.pool[ai].next, idx++) {
        Arc *a = &c.pool[ai];
        int64_t cost = a->cost + c.conn[(int64_t)a->last_right * n_ctx];
        if (least_idx < 0 || cost < least) { least = cost; least_idx = idx; }
    }

    int64_t cnt = 0;
    int overflow = 0;
    int discard_punct = (flags & FLAG_DISCARD_PUNCT) != 0;
    int unigrams = (flags & FLAG_EXTENDED) != 0;  /* output_unknown_unigrams */
    int32_t pos = n, best_idx = least_idx;

    while (pos > 0) {
        Arc *a = arc_at(&c, pos, best_idx);
        int32_t back_pos = a->back_pos;
        int32_t bwp = a->back_word_pos;
        int32_t length = pos - bwp;
        int8_t back_type = a->type;
        int32_t back_id = a->back_id;
        int32_t next_best_idx = a->back_index;

        if (unigrams && back_type == TYPE_UNKNOWN) {
            int32_t i = length - 1;
            while (i >= 0) {
                int32_t char_len = 1;
                uint32_t chk = text[bwp + i];
                if (i > 0 && chk >= 0xDC00 && chk <= 0xDFFF) {
                    i -= 1;
                    char_len = 2;
                }
                if (emit(out, &cnt, bwp + i, bwp + i + char_len,
                         TYPE_UNKNOWN, back_id, 1, 1, -1))
                    overflow = 1;
                i -= 1;
            }
        } else {
            int32_t ptype = ent_ptype(&c, back_id, back_type);
            if (ptype == 0 /* MORPHEME */ || mode == 0 /* NONE */) {
                if (!(discard_punct && (charflags[text[bwp]] & CF_PUNCT)))
                    if (emit(out, &cnt, bwp, pos, back_type, back_id,
                             1, 1, -1))
                        overflow = 1;
            } else {
                const int32_t *moff, *mcnt_a, *mlens;
                if (back_type == TYPE_KNOWN) {
                    moff = known->m_off; mcnt_a = known->m_cnt;
                    mlens = known->m_lens;
                } else if (back_type == TYPE_USER) {
                    moff = user->m_off; mcnt_a = user->m_cnt;
                    mlens = user->m_lens;
                } else {
                    moff = unk->m_off; mcnt_a = unk->m_cnt;
                    mlens = unk->m_lens;
                }
                int32_t mc = mcnt_a[back_id];
                if (mc == 0) {
                    if (emit(out, &cnt, bwp, pos, back_type, back_id,
                             1, 1, -1))
                        overflow = 1;
                } else {
                    /* parts appended i = mc-1 .. 0, then (MIXED) the
                     * compound token (ko.py:255-280) */
                    int32_t end_offset = pos, pos_len = 0;
                    for (int32_t i = mc - 1; i >= 0; i--) {
                        int32_t mlen = mlens[moff[back_id] + i];
                        int8_t pinc = (i == 0 && mode == 2) ? 0 : 1;
                        int rcode;
                        if (ptype == 1 /* COMPOUND */)
                            rcode = emit(out, &cnt, end_offset - mlen,
                                         end_offset, back_type, back_id,
                                         1, pinc, i);
                        else  /* INFLECT / PREANALYSIS: whole span */
                            rcode = emit(out, &cnt, bwp, pos, back_type,
                                         back_id, 1, pinc, i);
                        if (rcode) overflow = 1;
                        pos_len++;
                        end_offset -= mlen;
                    }
                    if (mode == 2 /* MIXED */) {
                        int32_t pl = pos_len > 1 ? pos_len : 1;
                        if (emit(out, &cnt, bwp, pos, back_type, back_id,
                                 pl, 1, -1))
                            overflow = 1;
                    }
                }
            }
        }

        if (!discard_punct && bwp != back_pos) {
            /* whitespace run as a SPACE unknown token (ko.py:282-288) */
            if (emit(out, &cnt, back_pos, bwp, 3, -1, 1, 1, -1))
                overflow = 1;
        }

        pos = back_pos;
        best_idx = next_best_idx;
    }

    ctx_free(&c);
    return overflow ? -2 : cnt;
}
