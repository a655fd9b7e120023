/* Minimal glib shim for compiling the reference cprocess kernels
 * (/root/reference/src/cprocess) standalone, without GLib installed.
 *
 * Only the symbols those translation units actually use are provided.
 * Single-threaded semantics are fine: the baseline harness times the
 * kernels from one thread (this host has 1 core).
 */
#ifndef CBASELINE_GLIB_SHIM_H
#define CBASELINE_GLIB_SHIM_H

#include <stdlib.h>
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <assert.h>
#include <limits.h>

typedef void *gpointer;
typedef int gboolean;
typedef size_t gsize;
typedef uint32_t GQuark;
typedef unsigned int guint;
typedef int gint;
typedef char gchar;
typedef void (*GFreeFunc)(gpointer data);
typedef void (*GDestroyNotify)(gpointer data);

#define G_PI 3.14159265358979323846
#define G_MAXINT INT_MAX
#define G_MININT INT_MIN
#define G_LIKELY(x) __builtin_expect(!!(x), 1)
#define G_UNLIKELY(x) __builtin_expect(!!(x), 0)
#define G_GNUC_CONST __attribute__((const))
#define G_GNUC_PURE __attribute__((pure))
#define G_GNUC_MALLOC __attribute__((malloc))
#define G_STRINGIFY_ARG(x) #x
#define G_STRINGIFY(x) G_STRINGIFY_ARG(x)

#define g_assert(expr) assert(expr)
#define g_print(...) printf(__VA_ARGS__)
#define g_debug(...) ((void) 0)
#define g_warning(...) fprintf(stderr, __VA_ARGS__)

static inline gpointer g_malloc(gsize n) { return malloc(n); }
static inline gpointer g_malloc0(gsize n) { return calloc(1, n); }
static inline void g_free(gpointer p) { free(p); }
static inline gpointer g_slice_alloc(gsize n) { return malloc(n); }
static inline gpointer g_slice_alloc0(gsize n) { return calloc(1, n); }
static inline void g_slice_free1(gsize n, gpointer p) { (void) n; free(p); }

#define g_slice_new(type) ((type *) malloc(sizeof(type)))
#define g_slice_new0(type) ((type *) calloc(1, sizeof(type)))
#define g_slice_free(type, mem) free(mem)
#define g_new(type, n) ((type *) malloc(sizeof(type) * (n)))
#define g_new0(type, n) ((type *) calloc((n), sizeof(type)))

/* Single-threaded g_once: enter returns true the first time. */
static inline gboolean g_once_init_enter(volatile void *location) {
    return *(volatile gsize *) location == 0;
}
static inline void g_once_init_leave(volatile void *location, gsize result) {
    *(volatile gsize *) location = result;
}

/* Quark/dataset API is only used by the GL shader caches, which the
 * harness never exercises; stubs live in stubs.c. */
GQuark g_quark_from_static_string(const char *string);
gpointer g_dataset_id_get_data(gpointer location, GQuark key);
void g_dataset_id_set_data_full(gpointer location, GQuark key,
                                gpointer data, GDestroyNotify destroy);

/* Single-threaded GMutex: no-ops (workspace.c; parity tests are
 * single-threaded). */
typedef struct { int dummy; } GMutex;
static inline void g_mutex_init(GMutex *m) { (void) m; }
static inline void g_mutex_clear(GMutex *m) { (void) m; }
static inline void g_mutex_lock(GMutex *m) { (void) m; }
static inline void g_mutex_unlock(GMutex *m) { (void) m; }

/* GSequence (workspace.c): linked-list implementation in gsequence.c. */
typedef const void *gconstpointer;
typedef gint (*GCompareDataFunc)(gconstpointer a, gconstpointer b,
                                 gpointer user_data);
typedef struct _GSequence GSequence;
typedef struct _GSequenceNode GSequenceIter;

GSequence *g_sequence_new(GDestroyNotify free_func);
void g_sequence_free(GSequence *seq);
gint g_sequence_get_length(GSequence *seq);
GSequenceIter *g_sequence_get_begin_iter(GSequence *seq);
GSequenceIter *g_sequence_get_end_iter(GSequence *seq);
GSequenceIter *g_sequence_get_iter_at_pos(GSequence *seq, gint pos);
gboolean g_sequence_iter_is_begin(GSequenceIter *iter);
gboolean g_sequence_iter_is_end(GSequenceIter *iter);
GSequenceIter *g_sequence_iter_next(GSequenceIter *iter);
GSequenceIter *g_sequence_iter_prev(GSequenceIter *iter);
gpointer g_sequence_get(GSequenceIter *iter);
gint g_sequence_iter_compare(GSequenceIter *a, GSequenceIter *b);
GSequenceIter *g_sequence_insert_sorted(GSequence *seq, gpointer data,
                                        GCompareDataFunc cmp_func,
                                        gpointer user_data);
void g_sequence_sort_changed(GSequenceIter *iter,
                             GCompareDataFunc cmp_func,
                             gpointer user_data);
void g_sequence_remove(GSequenceIter *iter);

#endif
