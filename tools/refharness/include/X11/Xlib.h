// Stub Xlib.h: just the typedefs /root/reference/src/common.h's linux
// WindowHandle needs. The headless harness never creates a real window and
// never links libX11; bitmap.cpp is replaced by bitmap_stub.cpp.
#pragma once

typedef struct _XDisplay Display;
typedef unsigned long XID;
typedef XID Window;
typedef XID Drawable;
typedef XID Pixmap;
typedef unsigned long KeySym;

typedef struct XImage XImage;  // opaque; unused by the stub bitmap
