// Headless replacement for /root/reference/src/bitmap.cpp: same class
// interface (bitmap.h), no X11. Stores the float pixel values handed to
// SetPixel (the reference's tonemapped, clamped 0..255.99 output) so the
// harness can dump them at full precision; Paint() publishes the buffer to
// a global the harness reads after kernel->OnRender().
#include "bitmap.h"

#include <cstring>
#include <map>
#include <vector>

namespace harness
{
// keyed by Bitmap instance; tiny (one bitmap per run). Heap-allocated and
// deliberately leaked: the reference holds its CPUDetails (and the Bitmap
// inside) in a namespace-scope static (cpu_trace.cpp:18-20) whose
// destructor may run AFTER this TU's statics — a static-destruction-order
// crash if the store were a plain static.
static std::map<const Bitmap*, std::vector<float>>& store()
{
	static auto* s = new std::map<const Bitmap*, std::vector<float>>;
	return *s;
}
std::vector<float> g_last_painted;
unsigned g_last_w = 0, g_last_h = 0;
}  // namespace harness

bool Bitmap::Create(WindowHandle ctx, u32 w, u32 h)
{
	width_ = w;
	height_ = h;
	bitmap_ = nullptr;
	bitmap_bytes_ = new u32[static_cast<size_t>(w) * h]();
	harness::store()[this].assign(static_cast<size_t>(w) * h * 3, 0.f);
	return true;
}

void Bitmap::Destroy()
{
	delete[] bitmap_bytes_;
	bitmap_bytes_ = nullptr;
	harness::store().erase(this);
}

void Bitmap::SetPixel(u32 x, u32 y, const vec3& pixel)
{
	if (x >= width_ || y >= height_) return;
	const size_t idx = static_cast<size_t>(y) * width_ + x;
	// same u8 packing as the real bitmap.cpp (BGRA truncation)...
	const u32 r = static_cast<u32>(pixel.r) & 0xff;
	const u32 g = static_cast<u32>(pixel.g) & 0xff;
	const u32 b = static_cast<u32>(pixel.b) & 0xff;
	bitmap_bytes_[idx] = (0xffu << 24) | (r << 16) | (g << 8) | b;
	// ...plus the full-precision floats for statistical comparison.
	std::vector<float>& f = harness::store()[this];
	f[idx * 3 + 0] = pixel.r;
	f[idx * 3 + 1] = pixel.g;
	f[idx * 3 + 2] = pixel.b;
}

void Bitmap::Clear(const vec3& color)
{
	for (u32 y = 0; y < height_; ++y)
		for (u32 x = 0; x < width_; ++x)
			SetPixel(x, y, color);
}

void Bitmap::Paint(WindowHandle ctx)
{
	(void)ctx;
	harness::g_last_painted = harness::store()[this];
	harness::g_last_w = width_;
	harness::g_last_h = height_;
}
