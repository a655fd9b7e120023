/* Minimal OpenGL/GLEW type+symbol shim. The baseline harness only runs
 * the CPU (f16/f32) kernel paths; GL entry points must merely compile
 * and link. No-op definitions are in stubs.c. */
#ifndef CBASELINE_GLEW_SHIM_H
#define CBASELINE_GLEW_SHIM_H

#include <stddef.h>

typedef struct GLEWContext_s GLEWContext;
typedef unsigned int GLuint;
typedef unsigned int GLenum;
typedef int GLint;
typedef int GLsizei;
typedef float GLfloat;
typedef unsigned char GLboolean;
typedef void GLvoid;

#define GL_TEXTURE0 0x84C0
#define GL_TEXTURE1 0x84C1
#define GL_TEXTURE2 0x84C2
#define GL_TEXTURE_RECTANGLE_ARB 0x84F5
#define GL_TEXTURE_RECTANGLE 0x84F5
#define GL_UNPACK_ALIGNMENT 0x0CF5
#define GL_UNPACK_ROW_LENGTH 0x0CF2
#define GL_LUMINANCE8 0x8040
#define GL_LUMINANCE 0x1909
#define GL_UNSIGNED_BYTE 0x1401
#define GL_HALF_FLOAT_ARB 0x140B
#define GL_RGBA 0x1908
#define GL_RGBA_FLOAT16_ATI 0x881A
#define GL_RGBA16F_ARB 0x881A
#define GL_FLOAT 0x1406
#define GL_NEAREST 0x2600
#define GL_TEXTURE_MAG_FILTER 0x2800
#define GL_TEXTURE_MIN_FILTER 0x2801

/* extras needed to compile video_subsample.c's (never-run) GL path */
#define GL_FALSE 0
#define GL_TRIANGLE_FAN 0x0006
#define GL_ARRAY_BUFFER 0x8892
#define GL_STATIC_DRAW 0x88E4
#define GL_FRAGMENT_SHADER 0x8B30
#define GL_VERTEX_SHADER 0x8B31
#define GL_FRAMEBUFFER_EXT 0x8D40
#define GL_COLOR_ATTACHMENT0_EXT 0x8CE0
#define GL_COLOR_ATTACHMENT1_EXT 0x8CE1
#define GL_MAX_COLOR_ATTACHMENTS 0x8CDF
#define GL_MAX_DRAW_BUFFERS 0x8824
typedef ptrdiff_t GLsizeiptr;
typedef ptrdiff_t GLintptr;

void glUseProgram(GLuint program);
GLint glGetUniformLocation(GLuint program, const char *name);
void glUniform1i(GLint location, GLint v0);
void glUniform1f(GLint location, GLfloat v0);
void glUniform2f(GLint location, GLfloat v0, GLfloat v1);
void glUniform3f(GLint location, GLfloat v0, GLfloat v1, GLfloat v2);
void glUniform4f(GLint location, GLfloat v0, GLfloat v1, GLfloat v2, GLfloat v3);
void glUniformMatrix3fv(GLint location, GLsizei count, GLboolean transpose, const GLfloat *value);
void glGenTextures(GLsizei n, GLuint *textures);
void glDeleteTextures(GLsizei n, const GLuint *textures);
void glBindTexture(GLenum target, GLuint texture);
void glActiveTexture(GLenum texture);
void glEnable(GLenum cap);
void glDisable(GLenum cap);
void glPixelStorei(GLenum pname, GLint param);
void glTexImage2D(GLenum target, GLint level, GLint internalformat,
                  GLsizei width, GLsizei height, GLint border,
                  GLenum format, GLenum type, const void *pixels);
void glTexParameteri(GLenum target, GLenum pname, GLint param);
void glGetTexImage(GLenum target, GLint level, GLenum format, GLenum type, void *pixels);

/* extras for video_subsample.c's GL path (no-op stubs in stubs.c) */
void glGenBuffers(GLsizei n, GLuint *buffers);
void glDeleteBuffers(GLsizei n, const GLuint *buffers);
void glBindBuffer(GLenum target, GLuint buffer);
void glBufferData(GLenum target, GLsizeiptr size, const void *data, GLenum usage);
GLint glGetAttribLocation(GLuint program, const char *name);
void glEnableVertexAttribArray(GLuint index);
void glDisableVertexAttribArray(GLuint index);
void glVertexAttribPointer(GLuint index, GLint size, GLenum type,
                           GLboolean normalized, GLsizei stride, const void *pointer);
void glDrawArrays(GLenum mode, GLint first, GLsizei count);
void glDrawBuffers(GLsizei n, const GLenum *bufs);
void glGetIntegerv(GLenum pname, GLint *data);
void glViewport(GLint x, GLint y, GLsizei width, GLsizei height);
void glUniform2i(GLint location, GLint v0, GLint v1);
void glUniform2iv(GLint location, GLsizei count, const GLint *value);
void glGenFramebuffersEXT(GLsizei n, GLuint *ids);
void glDeleteFramebuffersEXT(GLsizei n, const GLuint *ids);
void glBindFramebufferEXT(GLenum target, GLuint framebuffer);
void glFramebufferTexture2DEXT(GLenum target, GLenum attachment,
                               GLenum textarget, GLuint texture, GLint level);
void glDeleteProgram(GLuint program);
void glDeleteShader(GLuint shader);

#endif
