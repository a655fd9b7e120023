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

#endif
