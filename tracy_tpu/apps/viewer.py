"""Interactive progressive viewer.

Equivalent of the reference's windowed main loop (win_raytracer.cpp:494-556 +
the Win32/X11 windowing + Bitmap blit): the image keeps accumulating samples
("image will keep getting better", README.md:8) while WASDQE moves the camera
and left-drag looks around; any camera change is a camera cut that resets
accumulation. Window title telemetry (MRays/s @ fps) becomes the figure
title, refreshed ~1 Hz.

While the camera is moving, frames render at PREVIEW RESOLUTION (1/4 in
each dimension = 16x fewer rays, -preview-scale) and upscale for display,
so look-around stays interactive even at 1080p targets; the first still
frame snaps back to full resolution and restarts accumulation. Resizing
the window re-derives the render resolution and the camera projection
(the reference's WM_SIZE -> Camera::UpdateProjection path,
win_raytracer.cpp:118-124, camera.h:44-55) — on TPU a resize implies a
recompile, so it happens once per new size, not per frame.

Implemented with matplotlib (the only GUI stack in the image — no X11 dev
headers for a native window). Run:

    python -m tracy_tpu.apps.viewer -scene data/scenes/cornell.scn

Headless environments can use -frames N -out img.png for a burst render
(same loop, no window).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def preview_config(cfg, scale: int):
    """Downscaled copy of cfg for camera-motion preview frames (None when
    scale <= 1 or the image is already tiny). Dimensions snap to multiples
    of 32 so packets keep square tiles."""
    if scale <= 1:
        return None
    w = max(64, (cfg.width // scale) // 32 * 32)
    h = max(32, (cfg.height // scale) // 32 * 32)
    if w >= cfg.width or h >= cfg.height:
        return None
    import dataclasses as _dc

    return _dc.replace(cfg, width=w, height=h)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-scene", default=None)
    p.add_argument("-data-root", default=None)
    p.add_argument("-width", type=int, default=640)
    p.add_argument("-height", type=int, default=480)
    p.add_argument("-spp", type=int, default=1)
    p.add_argument("-bounces", type=int, default=5)
    p.add_argument("-cpu", action="store_true")
    p.add_argument("-frames", type=int, default=0,
                   help="headless: render N frames then save and exit")
    p.add_argument("-preview-scale", type=int, default=4,
                   help="camera-motion preview downscale (1 = off)")
    p.add_argument("-out", default="viewer.png")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.apps.input import CameraController, CameraState
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import default_scene, load_scene
    from tracy_tpu.utils.log import log

    if args.scene:
        builder = load_scene(args.scene, data_root=args.data_root,
                             width=args.width, height=args.height)
    else:
        builder = default_scene(args.width, args.height)
    scene = builder.build()
    # Production knobs on TPU (the config defaults carry the measured
    # kernel config; wave compaction needs a frame-size-derived group).
    try:
        import jax as _jax

        on_tpu = not args.cpu and _jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if on_tpu:
        from tracy_tpu.accel.reorder import pick_compact_group

        compact = pick_compact_group(
            builder.width * builder.height,
            num_tris=builder.num_triangles,
            has_translucent=builder.has_translucent)
    else:
        compact = 0
    cfg = RenderConfig(width=builder.width, height=builder.height,
                       spp=args.spp, max_bounces=args.bounces,
                       accel="packet" if on_tpu else "bvh",
                       wave_compact_group=compact)

    cam = builder.camera_params
    controller = CameraController(CameraState(
        eye=np.asarray(cam["eye"], dtype=np.float64),
        target=np.asarray(cam["center"], dtype=np.float64),
        up=np.asarray(cam["up"], dtype=np.float64),
        fov_degrees=float(cam["fov_degrees"]),
        aspect=builder.width / max(builder.height, 1),
    ))

    renderer = Renderer(cfg)
    state = init_state(cfg)

    if args.frames > 0:
        for _ in range(args.frames):
            state, _ = renderer.step(scene, state)
        from tracy_tpu.utils.image_io import save_image

        save_image(renderer.display_u8(state), args.out)
        log(f"saved {args.out}")
        return 0

    import dataclasses

    import matplotlib

    matplotlib.use("TkAgg" if matplotlib.get_backend() == "agg" else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.set_axis_off()
    im = ax.imshow(np.zeros((cfg.height, cfg.width, 3), np.uint8))
    mouse_pos = [None]

    # Preview-resolution renderer for camera motion (16x fewer rays at the
    # default scale): its own Renderer + state so both jit programs stay
    # cached across mode flips.
    pcfg = preview_config(cfg, args.preview_scale)
    prenderer = Renderer(pcfg) if pcfg is not None else None
    pstate = init_state(pcfg) if pcfg is not None else None
    previewing = False

    fig.canvas.mpl_connect("key_press_event", lambda e: controller.key_down(e.key or ""))
    fig.canvas.mpl_connect("key_release_event", lambda e: controller.key_up(e.key or ""))
    fig.canvas.mpl_connect(
        "button_press_event",
        lambda e: controller.mouse_press(e.x, e.y) if e.button == 1 else None,
    )
    fig.canvas.mpl_connect(
        "button_release_event", lambda e: controller.mouse_release()
    )
    fig.canvas.mpl_connect(
        "motion_notify_event", lambda e: mouse_pos.__setitem__(0, (e.x, e.y))
    )
    # Window resize -> new render resolution + projection (the reference's
    # WM_SIZE -> Camera::UpdateProjection path). Snapped to 32-multiples;
    # applied in the loop (a resize implies a jit recompile on TPU).
    resize_req = [None]

    def _on_resize(e):
        w2 = max(64, int(e.width) // 32 * 32)
        h2 = max(32, int(e.height) // 32 * 32)
        resize_req[0] = (w2, h2)

    fig.canvas.mpl_connect("resize_event", _on_resize)

    last_title = time.perf_counter()
    last_frame = time.perf_counter()
    plt.show(block=False)
    while plt.fignum_exists(fig.number):
        now = time.perf_counter()
        dt = min(now - last_frame, 0.25) * 60.0  # reference dt is in frames-ish
        last_frame = now

        if resize_req[0] is not None and resize_req[0] != (cfg.width,
                                                           cfg.height):
            w2, h2 = resize_req[0]
            resize_req[0] = None
            cfg = dataclasses.replace(cfg, width=w2, height=h2)
            controller.state = dataclasses.replace(
                controller.state, aspect=w2 / max(h2, 1))
            scene = dataclasses.replace(scene,
                                        camera=controller.state.to_camera())
            renderer = Renderer(cfg)
            state = init_state(cfg)
            pcfg = preview_config(cfg, args.preview_scale)
            prenderer = Renderer(pcfg) if pcfg is not None else None
            pstate = init_state(pcfg) if pcfg is not None else None
            log(f"resize -> {w2}x{h2} (projection updated)")
        elif resize_req[0] is not None:
            resize_req[0] = None

        moved = controller.update(dt, mouse_pos[0])
        if moved:
            # Camera cut: rebuild camera arrays, reset accumulation
            # (TracyEvent::eCameraCut, cpu_trace.cpp:76-78).
            scene = dataclasses.replace(scene, camera=controller.state.to_camera())
            state = init_state(cfg)
            renderer.total_rays = 0.0
            renderer.timer.reset()
            if prenderer is not None:
                pstate = init_state(pcfg)
                previewing = True
        elif previewing:
            previewing = False  # first still frame: back to full res
            state = init_state(cfg)

        if previewing and prenderer is not None:
            pstate, _ = prenderer.step(scene, pstate)
            img = np.asarray(prenderer.display_u8(pstate))
            # nearest-neighbor upscale to the display size
            img = img.repeat(args.preview_scale, axis=0).repeat(
                args.preview_scale, axis=1)[:cfg.height, :cfg.width]
            im.set_data(img)
        else:
            state, _ = renderer.step(scene, state)
            im.set_data(renderer.display_u8(state))

        if now - last_title > 1.0:
            r_live = prenderer if previewing and prenderer else renderer
            st_live = pstate if previewing and prenderer else state
            fig.suptitle(
                f"{builder.name} — {r_live.mrays_per_sec:.2f} MRays/s @ "
                f"{int(st_live.frame) / max(r_live.timer.total, 1e-9):.2f} "
                f"fps{' [preview]' if previewing else ''}"
            )
            last_title = now
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
