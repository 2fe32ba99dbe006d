#!/usr/bin/env python3
"""Generate reference golden renders with the headless reference build.

Pipeline:
  1. ensure tests/fixtures/sky.hdr exists (synthetic equirect HDR probe —
     the reference snapshot ships helmet.scn/spheres.scn pointing at a
     data/sky.hdr that does not exist; loading it there is UB
     (scene.cpp:24-48 returns UINT32_MAX which indexes textures_ OOB), so
     both builds get this fixture instead);
  2. build a shadow cwd with symlinks to /root/reference/data plus the
     fixture, so the read-only reference tree is never written;
  3. write small-resolution copies of the reference .scn files (only the
     OUT line changes) under tests/goldens/scn/;
  4. run tools/refharness/refharness (the reference's own scene.cpp +
     cpu_trace.cpp + cpu_details.cpp compiled headless) for each scene;
  5. store float16 .npz goldens under tests/goldens/ref/.

Golden arrays are the reference's tonemapped output (0..255 clamp of
255.99*srgb(linear)), y=0 scanline first == image BOTTOM row first (the
reference's v = y/h convention, camera.h:28-35).

Run:  python tools/refharness/make_goldens.py [scene ...]
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
HARNESS = os.path.join(REPO, "tools", "refharness", "refharness")
SCN_DIR = os.path.join(REPO, "tests", "goldens", "scn")
OUT_DIR = os.path.join(REPO, "tests", "goldens", "ref")
FIXTURES = os.path.join(REPO, "tests", "fixtures")
SHADOW = "/tmp/refharness_cwd"

# scene -> (width, height, frames). Small images + many frames: runtime is
# fine (the reference does several MRays/s on this host) and the statistical
# comparison needs low MC noise more than it needs pixels.
SCENES = {
    "furnace": (256, 192, 1024),
    "cornell": (256, 256, 1024),
    "spheres": (256, 192, 1024),
    "testtree": (256, 192, 512),
    "trimesh": (320, 240, 512),
    "random": (320, 240, 512),
    "bunny": (256, 192, 512),
    "dragon": (256, 192, 512),
    "helmet": (256, 192, 512),
}


def write_sky_hdr(path: str) -> None:
    """Synthetic 64x32 equirect HDR probe (flat RGBE, stb-readable).

    Gradient sky (warm horizon -> bright bluish zenith, dim ground) plus a
    20x-bright sun disk: directional light so parity failures in the
    equirect mapping/texture path actually move pixels.
    """
    import numpy as np

    w, h = 64, 32
    v = (np.arange(h) + 0.5) / h          # 0 = top row (+Y in equirect)
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    elev = (0.5 - vv) * np.pi             # +pi/2 at top, -pi/2 at bottom
    up = np.clip(np.sin(elev), 0.0, 1.0)
    down = np.clip(-np.sin(elev), 0.0, 1.0)
    sky = np.stack(
        [
            0.9 - 0.6 * up,                # warm near horizon -> bluer up
            0.85 - 0.25 * up,
            0.8 + 0.9 * up,
        ],
        axis=-1,
    ) * (1.0 - down[..., None])
    ground = np.stack([0.25 * down, 0.22 * down, 0.2 * down], axis=-1)
    img = (sky + ground).astype(np.float32)
    # sun disk at azimuth u=0.25, elevation ~40deg
    du = np.minimum(np.abs(uu - 0.25), 1.0 - np.abs(uu - 0.25)) * 2 * np.pi
    de = elev - np.radians(40.0)
    img[np.sqrt((du * np.cos(elev)) ** 2 + de**2) < 0.18] = [20.0, 18.0, 15.0]

    rgbe = np.zeros((h, w, 4), np.uint8)
    m = img.max(axis=-1)
    nz = m >= 1e-32
    e = np.zeros_like(m, np.int32)
    f = np.zeros_like(m)
    f[nz], e[nz] = np.frexp(m[nz])
    scale = np.zeros_like(m)
    scale[nz] = f[nz] * 256.0 / m[nz]
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {h} +X {w}\n".encode())
        fh.write(rgbe.tobytes())
    print(f"wrote {path}")


def make_shadow_cwd() -> None:
    data = os.path.join(SHADOW, "data")
    os.makedirs(data, exist_ok=True)
    for name in os.listdir(os.path.join(REF, "data")):
        if name == "scenes":
            continue
        dst = os.path.join(data, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(REF, "data", name), dst)
    sky = os.path.join(data, "sky.hdr")
    if not os.path.exists(sky):
        os.symlink(os.path.join(FIXTURES, "sky.hdr"), sky)


def write_scn_copies() -> None:
    os.makedirs(SCN_DIR, exist_ok=True)
    for scene, (w, h, _) in SCENES.items():
        src = os.path.join(REF, "data", "scenes", f"{scene}.scn")
        lines = []
        with open(src) as fh:
            for line in fh:
                if line.startswith("OUT "):
                    line = f"OUT {w} {h}\n"
                lines.append(line)
        with open(os.path.join(SCN_DIR, f"{scene}.scn"), "w") as fh:
            fh.writelines(lines)


def run_scene(scene: str) -> None:
    import numpy as np

    w, h, frames = SCENES[scene]
    scn = os.path.join(SCN_DIR, f"{scene}.scn")
    raw = os.path.join(SHADOW, f"{scene}.raw")
    cmd = [HARNESS, scn, str(frames), raw]
    print("+", " ".join(cmd))
    subprocess.run(cmd, cwd=SHADOW, check=True)
    with open(raw, "rb") as fh:
        magic, rw, rh, rframes = struct.unpack("<IIII", fh.read(16))
        assert magic == 0x59435254 and (rw, rh) == (w, h), (rw, rh)
        img = np.frombuffer(fh.read(), np.float32).reshape(rh, rw, 3)
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f"{scene}.npz")
    np.savez_compressed(
        out, image=img.astype(np.float16), frames=np.int32(rframes)
    )
    print(f"wrote {out} mean={img.mean():.3f}")


def main() -> None:
    if not os.path.exists(HARNESS):
        print("build tools/refharness first (make -C tools/refharness)")
        sys.exit(1)
    write_sky_hdr(os.path.join(FIXTURES, "sky.hdr"))
    make_shadow_cwd()
    write_scn_copies()
    scenes = sys.argv[1:] or list(SCENES)
    for scene in scenes:
        run_scene(scene)


if __name__ == "__main__":
    main()
