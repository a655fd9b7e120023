/* Link stubs for symbols the reference kernels reference but the
 * baseline harness never calls (GL paths + glib quark/dataset API). */
#include <stddef.h>
#include <stdlib.h>
#include <stdio.h>
#include <stdint.h>

typedef unsigned int GLuint;
typedef unsigned int GLenum;
typedef int GLint;
typedef int GLsizei;
typedef float GLfloat;
typedef unsigned char GLboolean;
typedef uint32_t GQuark;
typedef void *gpointer;
typedef void (*GDestroyNotify)(gpointer data);

static void die(const char *what) {
    fprintf(stderr, "cbaseline stub called unexpectedly: %s\n", what);
    abort();
}

GQuark g_quark_from_static_string(const char *string) { (void) string; return 1; }
gpointer g_dataset_id_get_data(gpointer l, GQuark k) { (void) l; (void) k; return NULL; }
void g_dataset_id_set_data_full(gpointer l, GQuark k, gpointer d, GDestroyNotify n) {
    (void) l; (void) k; (void) d; (void) n;
}

void glUseProgram(GLuint p) { (void) p; die("glUseProgram"); }
GLint glGetUniformLocation(GLuint p, const char *n) { (void) p; (void) n; return -1; }
void glUniform1i(GLint l, GLint v) { (void) l; (void) v; }
void glUniform1f(GLint l, GLfloat v) { (void) l; (void) v; }
void glUniform2f(GLint l, GLfloat a, GLfloat b) { (void) l; (void) a; (void) b; }
void glUniform3f(GLint l, GLfloat a, GLfloat b, GLfloat c) { (void) l; (void) a; (void) b; (void) c; }
void glUniform4f(GLint l, GLfloat a, GLfloat b, GLfloat c, GLfloat d) { (void) l; (void) a; (void) b; (void) c; (void) d; }
void glUniformMatrix3fv(GLint l, GLsizei c, GLboolean t, const GLfloat *v) { (void) l; (void) c; (void) t; (void) v; }
void glGenTextures(GLsizei n, GLuint *t) { (void) n; (void) t; die("glGenTextures"); }
void glDeleteTextures(GLsizei n, const GLuint *t) { (void) n; (void) t; }
void glBindTexture(GLenum t, GLuint x) { (void) t; (void) x; }
void glActiveTexture(GLenum t) { (void) t; }
void glEnable(GLenum c) { (void) c; }
void glDisable(GLenum c) { (void) c; }
void glPixelStorei(GLenum p, GLint v) { (void) p; (void) v; }
void glTexImage2D(GLenum t, GLint l, GLint i, GLsizei w, GLsizei h,
                  GLint b, GLenum f, GLenum ty, const void *p) {
    (void) t; (void) l; (void) i; (void) w; (void) h; (void) b; (void) f; (void) ty; (void) p;
}
void glTexParameteri(GLenum t, GLenum p, GLint v) { (void) t; (void) p; (void) v; }

/* gl.c helpers declared in framework.h (gl.c itself is not compiled) */
void *getCurrentGLContext(void) { return NULL; }
void *video_create_filter_program(const char *text, const char *name) {
    (void) text; (void) name; die("video_create_filter_program"); return NULL;
}
void video_delete_filter_program(void *program) { (void) program; }
GLuint video_make_gl_texture(int w, int h, void *data) {
    (void) w; (void) h; (void) data; die("video_make_gl_texture"); return 0;
}
void video_render_gl_frame(void *program, void *out, void *in, int count) {
    (void) program; (void) out; (void) in; (void) count; die("video_render_gl_frame");
}
void video_render_gl_frame_filter1(void *program, void *out, void *a) {
    (void) program; (void) out; (void) a; die("video_render_gl_frame_filter1");
}
void video_render_gl_frame_filter2(void *program, void *out, void *a, void *b) {
    (void) program; (void) out; (void) a; (void) b; die("video_render_gl_frame_filter2");
}
void gl_ensure_context(void) { die("gl_ensure_context"); }
void __gl_checkError(const char *file, const unsigned long line) { (void) file; (void) line; }
void glGetTexImage(GLenum t, GLint l, GLenum f, GLenum ty, void *p) {
    (void) t; (void) l; (void) f; (void) ty; (void) p; die("glGetTexImage");
}
void video_get_frame_gl(void *source, int frame_index, void *frame) {
    (void) source; (void) frame_index; (void) frame; die("video_get_frame_gl");
}

/* extras for video_subsample.c's GL path (parity lib; never executed) */
typedef ptrdiff_t GLsizeiptr;
void glGenBuffers(GLsizei n, GLuint *b) { (void) n; (void) b; die("glGenBuffers"); }
void glDeleteBuffers(GLsizei n, const GLuint *b) { (void) n; (void) b; }
void glBindBuffer(GLenum t, GLuint b) { (void) t; (void) b; }
void glBufferData(GLenum t, GLsizeiptr s, const void *d, GLenum u) {
    (void) t; (void) s; (void) d; (void) u;
}
GLint glGetAttribLocation(GLuint p, const char *n) { (void) p; (void) n; return -1; }
void glEnableVertexAttribArray(GLuint i) { (void) i; }
void glDisableVertexAttribArray(GLuint i) { (void) i; }
void glVertexAttribPointer(GLuint i, GLint s, GLenum t, GLboolean n, GLsizei st, const void *p) {
    (void) i; (void) s; (void) t; (void) n; (void) st; (void) p;
}
void glDrawArrays(GLenum m, GLint f, GLsizei c) { (void) m; (void) f; (void) c; die("glDrawArrays"); }
void glDrawBuffers(GLsizei n, const GLenum *b) { (void) n; (void) b; }
void glGetIntegerv(GLenum p, GLint *d) { (void) p; if (d) *d = 0; }
void glViewport(GLint x, GLint y, GLsizei w, GLsizei h) { (void) x; (void) y; (void) w; (void) h; }
void glUniform2i(GLint l, GLint a, GLint b) { (void) l; (void) a; (void) b; }
void glUniform2iv(GLint l, GLsizei c, const GLint *v) { (void) l; (void) c; (void) v; }
void glGenFramebuffersEXT(GLsizei n, GLuint *f) { (void) n; (void) f; die("glGenFramebuffersEXT"); }
void glDeleteFramebuffersEXT(GLsizei n, const GLuint *f) { (void) n; (void) f; }
void glBindFramebufferEXT(GLenum t, GLuint f) { (void) t; (void) f; }
void glFramebufferTexture2DEXT(GLenum t, GLenum a, GLenum tt, GLuint tx, GLint l) {
    (void) t; (void) a; (void) tt; (void) tx; (void) l;
}
void glDeleteProgram(GLuint p) { (void) p; }
void glDeleteShader(GLuint s) { (void) s; }
GLuint gl_compile_shader(GLenum t, const char *src, const char *n) {
    (void) t; (void) src; (void) n; die("gl_compile_shader"); return 0;
}
GLuint gl_link_program(const GLuint *s, int c, const char *n) {
    (void) s; (void) c; (void) n; die("gl_link_program"); return 0;
}
