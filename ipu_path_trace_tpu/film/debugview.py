"""Debug-visualisation render modes (--debug-view).

The reference's accumulator has a DEBUG contribution case that
short-circuits the stored colour straight into the film for diagnostic
renders (reference: src/codelets/codelets.cpp:283-285), and
PreProcessEscapedRays overwrites ``c.clr`` with the equirect UVs "for
debugging" (codelets.cpp:345).  This module is the analog: a saved-image
mode that replaces the Monte-Carlo radiance with a deterministic
diagnostic channel, rendered through the PRODUCTION camera and
intersector (film/denoise.primary_features - the same pixel-centre rays
that drive the denoiser guides).  The accumulator is untouched: like
--denoise, the debug view affects only what is written to -o, so a
progressive render keeps converging underneath.

Channels:
  normal       shading normal mapped to RGB as (n + 1) / 2; escaped
               pixels show the ray direction (the guide convention)
  albedo       the demodulation guide: diffuse primary-hit colour, env
               radiance along the centre ray for escaped pixels (HDR)
  depth        disparity 1 / (1 + t) as grayscale; sky = 0 (black)
  path-length  mean Monte-Carlo path length per pixel (pathLength /
               sampleCount from the live worklist) over max-path-length,
               grayscale heat - the load-balancer's own cost signal
               (LoadBalancer.cpp:118-140 sorts on exactly this quantity)
  escape-uv    the reference's UV debug overwrite (codelets.cpp:345):
               R = u, G = v for escaped centre rays, zero on hits
"""

from __future__ import annotations

import numpy as np

DEBUG_VIEWS = ("normal", "albedo", "depth", "path-length", "escape-uv")


def mean_path_length(u, v, path_length, sample_count,
                     width: int, height: int) -> np.ndarray:
    """(H, W) mean path length from per-record accumulators.

    ``path_length`` counts stack pushes summed over all samples of the
    record (render/wavefront.py:231-235, the u16 wire field of
    core/records.py); dividing by ``sampleCount`` recovers the mean.
    Padding records (coords out of range) and zero-sample records are
    skipped, mirroring Film.accumulate's bounds.
    """
    u = np.asarray(u).astype(np.int64)
    v = np.asarray(v).astype(np.int64)
    pl = np.asarray(path_length).astype(np.float64)
    cnt = np.asarray(sample_count).astype(np.float64)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height) & (cnt > 0)
    out = np.zeros((height, width), np.float32)
    mean = np.zeros(len(pl), np.float32)
    np.divide(pl, cnt, out=mean, where=cnt > 0, casting="unsafe")
    np.add.at(out, (v[ok], u[ok]), mean[ok])
    return out


def debug_view(mode: str, guides: dict,
               path_len_mean: np.ndarray | None = None,
               max_path_length: int = 10) -> np.ndarray:
    """(H, W, 3) float32 diagnostic image for ``mode``.

    ``guides`` is the dict from film/denoise.primary_features (which
    carries ``normal``, ``albedo``, ``disparity``, ``escape_uv``,
    ``hit``).  ``path_len_mean`` is required for mode "path-length"
    (from :func:`mean_path_length`).  Values are display-ready: [0, 1]
    for every mode except albedo, whose sky pixels carry HDR env
    radiance (the EXR keeps it; the PNG clips).
    """
    if mode not in DEBUG_VIEWS:
        raise ValueError(
            f"unknown debug view {mode!r}; choose from {DEBUG_VIEWS}")
    if mode == "normal":
        return (np.asarray(guides["normal"], np.float32) + 1.0) * 0.5
    if mode == "albedo":
        return np.asarray(guides["albedo"], np.float32)
    if mode == "depth":
        d = np.asarray(guides["disparity"], np.float32)
        return np.repeat(d[..., None], 3, axis=-1)
    if mode == "escape-uv":
        uv = np.asarray(guides["escape_uv"], np.float32)
        hit = np.asarray(guides["hit"], bool)
        img = np.zeros(uv.shape[:2] + (3,), np.float32)
        img[..., 0] = np.where(hit, 0.0, uv[..., 0])
        img[..., 1] = np.where(hit, 0.0, uv[..., 1])
        return img
    # path-length heat
    if path_len_mean is None:
        raise ValueError("path-length view needs the live worklist "
                         "(path_len_mean); it is only available in the "
                         "render loop's save path")
    heat = np.asarray(path_len_mean, np.float32) / float(max(max_path_length, 1))
    return np.repeat(np.clip(heat, 0.0, 1.0)[..., None], 3, axis=-1)


def debug_ldr(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """uint8 PNG encode for a debug image: clip + display gamma.

    Deterministic and exposure-independent - diagnostic channels are
    not radiance, so the film's exposure control does not apply (the
    reference's DEBUG case also bypasses tone mapping scale,
    codelets.cpp:283-285 vs AccumulatedImage.cpp:59-74).
    """
    x = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    x = x ** (1.0 / max(gamma, 1e-6))
    return (x * 255.0 + 0.5).astype(np.uint8)
