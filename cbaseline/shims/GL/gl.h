#ifndef CBASELINE_GL_SHIM_H
#define CBASELINE_GL_SHIM_H
#include "glew.h"
#endif
