"""Turntable animation: orbit the env light, write an MP4.

Renders N frames with the azimuth swept over 360 degrees and encodes
them through the same video layer the remote UI streams with
(ui/video.make_encoder: ffmpeg H.264 when available, the
dependency-free FMP4/MJPEG muxer otherwise).  Because the azimuth is a
traced RenderSettings field, all frames share ONE compiled step - the
orbit costs zero recompiles (the reference would re-upload nothing
either, but has no offline animation tool at all; its video path is
interactive-only, src/InterfaceServer.hpp:100-108).

Usage:
  python scripts/turntable.py [--assets DIR|constant:..|texture:..]
      [--scene FILE] [-w W] [-H H] [--spp N] [--frames N] [--fps N]
      [-o out.mp4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def render_turntable(width: int, height: int, spp: int, frames: int,
                     fps: int, assets: str, scene_path: str = "",
                     exposure: float = 0.0, gamma: float = 2.2,
                     outfile: str = "turntable.mp4",
                     codec: str = "auto") -> int:
    import jax

    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch)
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.core.scenefile import load_scene
    from ipu_path_trace_tpu.film.film import Film
    from ipu_path_trace_tpu.render import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step
    from ipu_path_trace_tpu.runtime.app import parse_env_assets
    from ipu_path_trace_tpu.ui.video import Fmp4MjpegEncoder, make_encoder

    scene = load_scene(scene_path) if scene_path else default_scene()
    env, _ = parse_env_assets(assets)
    cfg = StaticConfig(width=width, height=height)
    work0 = make_worklist(width, height)
    key = make_base_key(1)
    if codec == "mjpeg":  # deterministic, dependency-free (tests)
        enc = Fmp4MjpegEncoder(width, height, fps)
    else:
        enc = make_encoder(width, height, fps)
    print(f"encoder: {enc.codec}", file=sys.stderr)

    total = 0
    t0 = time.monotonic()
    with open(outfile, "wb") as f:  # stream to disk; long animations
        for i in range(frames):     # must not buffer the whole MP4
            azimuth = 360.0 * i / frames
            settings = RenderSettings.make(
                samples_per_step=spp, env_rotation_degrees=azimuth)
            out = render_step(scene, settings, cfg, to_device_batch(work0),
                              jax.random.fold_in(key, i), env)
            film = Film(width, height)
            film.accumulate(from_device_batch(out))
            for c in enc.encode(film.ldr(1, exposure, gamma)):
                f.write(c)
                total += len(c)
            if i % 10 == 0:
                print(f"frame {i}/{frames} ({time.monotonic()-t0:.1f}s)",
                      file=sys.stderr)
        for c in enc.close():  # trailing codec output (x264 buffers)
            f.write(c)
            total += len(c)
    secs = time.monotonic() - t0
    print(f"wrote {outfile}: {frames} frames @ {fps} fps, "
          f"{total/1e6:.2f} MB, {secs:.1f}s "
          f"({width*height*spp*frames/secs/1e6:.1f} Msamples/s)",
          file=sys.stderr)
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--assets", default="constant:0.9,0.8,0.7")
    p.add_argument("--scene", default="")
    p.add_argument("-w", "--width", type=int, default=384)
    p.add_argument("-H", "--height", type=int, default=384)
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--exposure", type=float, default=0.0)
    p.add_argument("--gamma", type=float, default=2.2)
    p.add_argument("--codec", default="auto", choices=["auto", "mjpeg"])
    p.add_argument("-o", "--outfile", default="turntable.mp4")
    a = p.parse_args()
    return render_turntable(a.width, a.height, a.spp, a.frames, a.fps,
                            a.assets, a.scene, a.exposure, a.gamma,
                            a.outfile, a.codec)


if __name__ == "__main__":
    raise SystemExit(main())
