/* Minimal GSequence + GMutex shim so the reference's workspace.c
 * (/root/reference/src/cprocess/workspace.c) compiles into the parity
 * library (tests/test_cref_parity.py) without GLib installed.
 *
 * Doubly-linked list with a permanent end sentinel: iterators are node
 * pointers, so they stay valid across inserts and repositions — the
 * semantics workspace.c relies on for its stored left/right/compiter
 * references. Insertion order for equal keys matches glib: a new or
 * repositioned element lands AFTER all elements that compare equal
 * (g_sequence_search semantics).
 *
 * Single-threaded: GMutex ops are no-ops (the parity tests drive the
 * workspace from one thread).
 */
#include "glib.h"

struct _GSequenceNode {
    struct _GSequenceNode *prev, *next;
    struct _GSequence *seq;
    gpointer data;
};

struct _GSequence {
    struct _GSequenceNode end;   /* sentinel: end.data unused */
    int length;
    GDestroyNotify free_func;
};

GSequence *g_sequence_new(GDestroyNotify free_func) {
    GSequence *seq = (GSequence *) calloc(1, sizeof(GSequence));
    seq->end.prev = &seq->end;
    seq->end.next = &seq->end;
    seq->end.seq = seq;
    seq->free_func = free_func;
    return seq;
}

void g_sequence_free(GSequence *seq) {
    GSequenceIter *it = seq->end.next;
    while (it != &seq->end) {
        GSequenceIter *next = it->next;
        if (seq->free_func)
            seq->free_func(it->data);
        free(it);
        it = next;
    }
    free(seq);
}

gint g_sequence_get_length(GSequence *seq) { return seq->length; }

GSequenceIter *g_sequence_get_begin_iter(GSequence *seq) {
    return seq->end.next;
}

GSequenceIter *g_sequence_get_end_iter(GSequence *seq) {
    return &seq->end;
}

GSequenceIter *g_sequence_get_iter_at_pos(GSequence *seq, gint pos) {
    if (pos < 0 || pos >= seq->length)
        return &seq->end;
    GSequenceIter *it = seq->end.next;
    while (pos-- > 0)
        it = it->next;
    return it;
}

gboolean g_sequence_iter_is_begin(GSequenceIter *iter) {
    return iter == iter->seq->end.next;
}

gboolean g_sequence_iter_is_end(GSequenceIter *iter) {
    return iter == &iter->seq->end;
}

GSequenceIter *g_sequence_iter_next(GSequenceIter *iter) {
    return g_sequence_iter_is_end(iter) ? iter : iter->next;
}

GSequenceIter *g_sequence_iter_prev(GSequenceIter *iter) {
    return g_sequence_iter_is_begin(iter) ? iter : iter->prev;
}

gpointer g_sequence_get(GSequenceIter *iter) { return iter->data; }

gint g_sequence_iter_compare(GSequenceIter *a, GSequenceIter *b) {
    if (a == b)
        return 0;
    /* the end sentinel orders after every node */
    if (g_sequence_iter_is_end(a))
        return 1;
    if (g_sequence_iter_is_end(b))
        return -1;
    /* walk forward from a; if we meet b, a comes first */
    for (GSequenceIter *it = a->next; !g_sequence_iter_is_end(it);
         it = it->next)
        if (it == b)
            return -1;
    return 1;
}

static void seq_link_before(GSequenceIter *pos, GSequenceIter *node) {
    node->prev = pos->prev;
    node->next = pos;
    pos->prev->next = node;
    pos->prev = node;
}

static void seq_unlink(GSequenceIter *node) {
    node->prev->next = node->next;
    node->next->prev = node->prev;
}

/* position before the first element that compares strictly greater
 * (i.e. after all equals) — glib's g_sequence_search placement */
static GSequenceIter *seq_sorted_pos(GSequence *seq, gpointer data,
                                     GCompareDataFunc cmp,
                                     gpointer user_data) {
    GSequenceIter *it = seq->end.next;
    while (it != &seq->end && cmp(data, it->data, user_data) >= 0)
        it = it->next;
    return it;
}

GSequenceIter *g_sequence_insert_sorted(GSequence *seq, gpointer data,
                                        GCompareDataFunc cmp_func,
                                        gpointer user_data) {
    GSequenceIter *node =
        (GSequenceIter *) calloc(1, sizeof(GSequenceIter));
    node->seq = seq;
    node->data = data;
    seq_link_before(seq_sorted_pos(seq, data, cmp_func, user_data), node);
    seq->length++;
    return node;
}

void g_sequence_sort_changed(GSequenceIter *iter,
                             GCompareDataFunc cmp_func,
                             gpointer user_data) {
    GSequence *seq = iter->seq;
    seq_unlink(iter);
    seq_link_before(seq_sorted_pos(seq, iter->data, cmp_func, user_data),
                    iter);
}

void g_sequence_remove(GSequenceIter *iter) {
    GSequence *seq = iter->seq;
    seq_unlink(iter);
    if (seq->free_func)
        seq->free_func(iter->data);
    seq->length--;
    free(iter);
}
