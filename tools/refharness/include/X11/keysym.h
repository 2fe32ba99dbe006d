// Stub (see Xlib.h).
#pragma once
