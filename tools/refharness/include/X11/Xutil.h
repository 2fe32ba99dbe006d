// Stub (see Xlib.h).
#pragma once
#include <X11/Xlib.h>
