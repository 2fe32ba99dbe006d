"""Interactive progressive viewer.

Equivalent of the reference's windowed main loop (win_raytracer.cpp:494-556 +
the Win32/X11 windowing + Bitmap blit): the image keeps accumulating samples
("image will keep getting better", README.md:8) while WASDQE moves the camera
and left-drag looks around; any camera change is a camera cut that resets
accumulation. Window title telemetry (MRays/s @ fps) becomes the figure
title, refreshed ~1 Hz.

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
    cfg = RenderConfig(width=builder.width, height=builder.height,
                       spp=args.spp, max_bounces=args.bounces)

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

    last_title = time.perf_counter()
    last_frame = time.perf_counter()
    plt.show(block=False)
    while plt.fignum_exists(fig.number):
        now = time.perf_counter()
        dt = min(now - last_frame, 0.25) * 60.0  # reference dt is in frames-ish
        last_frame = now

        if controller.update(dt, mouse_pos[0]):
            # Camera cut: rebuild camera arrays, reset accumulation
            # (TracyEvent::eCameraCut, cpu_trace.cpp:76-78).
            scene = dataclasses.replace(scene, camera=controller.state.to_camera())
            state = init_state(cfg)
            renderer.total_rays = 0.0
            renderer.timer.reset()

        state, _ = renderer.step(scene, state)
        im.set_data(renderer.display_u8(state))

        if now - last_title > 1.0:
            fig.suptitle(
                f"{builder.name} — {renderer.mrays_per_sec:.2f} MRays/s @ "
                f"{int(state.frame) / max(renderer.timer.total, 1e-9):.2f} fps"
            )
            last_title = now
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
