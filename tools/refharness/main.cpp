// Headless golden-render harness for the reference CPU path tracer.
//
// Links the reference's own Scene::Init (scene.cpp), CpuTrace
// (cpu_trace.cpp:33-170) and CPUDetails (cpu_details.cpp) unmodified,
// replacing only the windowing layer: a fake WindowHandle, a memory-only
// Bitmap (bitmap_stub.cpp), and this main() standing in for
// win_raytracer.cpp's event loop. Output is the tonemapped accumulated
// frame (values 0..255.99, pre-quantization) as a raw float32 RGB dump:
//   header "TRCY" u32 | width u32 | height u32 | frames u32, then
//   height*width*3 little-endian float32, row 0 first (y=0 scanline first,
//   which the reference's v = y/h camera convention makes the BOTTOM of
//   the image).
//
// Usage: refharness <scene.scn> <frames> <out.raw> [width height]
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "common.h"
#include "scene.h"
#include "kernels/raytracing/software/cpu_trace.h"

namespace harness
{
extern std::vector<float> g_last_painted;
extern unsigned g_last_w, g_last_h;
}  // namespace harness

int main(int argc, char** argv)
{
	if (argc < 4)
	{
		std::fprintf(stderr,
		             "usage: %s <scene.scn> <frames> <out.raw>\n", argv[0]);
		return 2;
	}
	const char* scene_path = argv[1];
	const uint32_t frames = static_cast<uint32_t>(std::atoi(argv[2]));
	const char* out_path = argv[3];

	uint32_t width = 640, height = 480;
	Scene world;
	if (!world.Init(scene_path, width, height))
	{
		std::fprintf(stderr, "scene init failed: %s\n", scene_path);
		return 1;
	}
	// Resolution comes from the scene's OUT tag (the camera's projection is
	// built with that aspect inside Scene::Init); to render smaller goldens,
	// point the harness at a copy of the .scn with an edited OUT line.

	handle_t win{ width, height, /*ds=*/0, /*dpy=*/nullptr, /*win=*/1 };
	WindowHandle handle = &win;

	CpuTrace kernel;
	if (!kernel.Startup(handle, world))
	{
		std::fprintf(stderr, "kernel startup failed\n");
		return 1;
	}

	std::fprintf(stderr, "scene '%s': %u objects, %u tris, %ux%u, %u frames\n",
	             world.GetName().c_str(), world.GetObjectCount(),
	             world.GetTriCount(), width, height, frames);

	// Timing mirrors the reference's own exit-time run average
	// (win_raytracer.cpp:511-515,563-569): the Timer wraps exactly the
	// kernel->OnUpdate call, and MRays/s = GetRayCount / accumulated span.
	const auto t0 = std::chrono::steady_clock::now();
	for (uint32_t f = 0; f < frames; ++f)
	{
		kernel.OnUpdate(world, 0.f);
		if ((f + 1) % 16 == 0 || f + 1 == frames)
		{
			std::fprintf(stderr, "\rframe %u/%u", f + 1, frames);
			std::fflush(stderr);
		}
	}
	const double secs = std::chrono::duration<double>(
		std::chrono::steady_clock::now() - t0).count();
	std::fprintf(stderr, "\n");
	std::fprintf(stderr, "perf: %.3f MRays/s (%llu rays, %.2fs, %u frames)\n",
	             static_cast<double>(kernel.GetRayCount(false)) / 1e6 / secs,
	             static_cast<unsigned long long>(kernel.GetRayCount(false)),
	             secs, frames);

	kernel.OnRender(handle);
	const uint64_t rays = kernel.GetRayCount(false);
	std::fprintf(stderr, "total rays: %llu\n",
	             static_cast<unsigned long long>(rays));

	FILE* out = std::fopen(out_path, "wb");
	if (!out)
	{
		std::fprintf(stderr, "cannot open %s\n", out_path);
		return 1;
	}
	const uint32_t magic = 0x59435254u;  // "TRCY"
	std::fwrite(&magic, 4, 1, out);
	std::fwrite(&harness::g_last_w, 4, 1, out);
	std::fwrite(&harness::g_last_h, 4, 1, out);
	std::fwrite(&frames, 4, 1, out);
	std::fwrite(harness::g_last_painted.data(), sizeof(float),
	            harness::g_last_painted.size(), out);
	std::fclose(out);
	std::fprintf(stderr, "wrote %s (%ux%u)\n", out_path, harness::g_last_w,
	             harness::g_last_h);

	kernel.Shutdown();
	return 0;
}
