"""Benchmark: full results-pipeline throughput (pairs/s) on one chip,
swept over 240p / 480p / 720p.

Runs the complete per-pair GME pipeline (3-level pyramid, dense diamond
init, hierarchical robust affine fit, dense field, compensation, PSNR) over
whole videos as batched device programs:

- 240p: the reference's committed fixture pan240.mp4 (320x240, 206 pairs).
- 480p / 720p: cubic upscales of pan240 (the BASELINE.md methodology — the
  reference CPU 720p number was measured on exactly such an upscale).

Measurement methodology (stated in the emitted JSON): the device relay
memoizes repeated (executable, input) dispatches, so timing repeat passes
over IDENTICAL data under-reports real cost by many x at small resolutions.
Here every timed dispatch uses input content the relay has never seen:

- compile/warm-up runs on a SYNTHETIC variant (pixel values offset by +191
  mod 256) — never on the data that is then timed;
- pass 1 times the REAL video cold; passes 2..N time whole-video passes over
  per-pass pixel-offset variants (+85k mod 256 — distinct content, identical
  shapes/geometry), so no timed dispatch repeats a pair of buffers the relay
  has dispatched before;
- the headline is the median of the N per-pass wall times.

Baselines (BASELINE.md, measured locally on this machine):
    pan240  (320x240):  2.575  pairs/s
    pan480  (640x480):  0.4672 pairs/s
    pan720 (1280x720):  0.1915 pairs/s

The headline metric is the 720p north-star (BASELINE.json: >=50x reference
CPU => >=9.57 pairs/s).  Prints ONE JSON line to stdout:
{"metric", "value", "unit", "vs_baseline"}; per-resolution detail goes to
stderr.
"""

import json
import os
import sys
import time

import numpy as np

# Reference CPU pairs/s measured locally (BASELINE.md).
BASELINES = {"240p": 2.575, "480p": 0.4672, "720p": 0.1915}
SIZES = {"240p": (240, 320), "480p": (480, 640), "720p": (720, 1280)}

PAN240 = "/root/reference/global_motion_estimation/resources/videos/pan240.mp4"

METHOD = (
    "cold-data passes: warm-up compiles on a +191 pixel-offset synthetic "
    "variant; each timed pass runs the whole video on content the relay has "
    "never dispatched (pass 1 = real video, pass k = +85(k-1) mod 256 "
    "variant); headline = median per-pass wall time"
)


def _load_pan240():
    if os.path.exists(PAN240):
        try:
            from gme_tpu.io.video import get_video_frames

            return np.stack(get_video_frames(PAN240))
        except Exception:
            pass
    # Synthetic fallback: 207 panning frames, same geometry as pan240.
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (480, 640), np.uint8)
    return np.stack([base[i : i + 240, 2 * i : 2 * i + 320] for i in range(207)])


def _upscale(frames: np.ndarray, hw) -> np.ndarray:
    H, W = hw
    try:
        import cv2

        return np.stack(
            [cv2.resize(f, (W, H), interpolation=cv2.INTER_CUBIC) for f in frames]
        )
    except Exception:
        # Dependency-free fallback: nearest-neighbour repeat (integer ratios).
        ry, rx = H // frames.shape[1], W // frames.shape[2]
        return np.repeat(np.repeat(frames, ry, axis=1), rx, axis=2)


def _run_resolution(frames: np.ndarray, batch: int, repeats: int = 3):
    import jax
    import jax.numpy as jnp

    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import gme_pipeline_batch

    cfg = GMEConfig()
    n_pairs = frames.shape[0] - 1

    def run_all(device_frames):
        outs = []
        for lo in range(0, n_pairs, batch):
            idx = np.arange(lo, min(lo + batch, n_pairs))
            if len(idx) < batch:  # pad to keep one compiled shape
                idx = np.concatenate([idx, np.full(batch - len(idx), n_pairs - 1)])
            prev = device_frames[idx]
            curr = device_frames[idx + 1]
            outs.append(gme_pipeline_batch(prev, curr, cfg))
        jax.block_until_ready(outs)
        return outs

    # Distinct-content videos: uint8 addition wraps, preserving shapes and
    # motion geometry while making every frame's bytes unique per variant.
    def variant(k):
        v = jnp.asarray(frames) + jnp.uint8(k)
        return jax.block_until_ready(v)

    run_all(variant(191))  # warm-up/compile on data that is never timed
    walls = []
    outs = None
    for rep in range(repeats):
        dev = variant(85 * rep)  # rep 0 == the real video
        t0 = time.perf_counter()
        o = run_all(dev)
        walls.append(time.perf_counter() - t0)
        if rep == 0:
            outs = o  # PSNR reported from the real-video pass
    dt = float(np.median(walls))
    psnrs = np.concatenate([np.asarray(o["psnr"]) for o in outs])[:n_pairs]
    return n_pairs / dt, dt, walls, psnrs, n_pairs


def main():
    import jax

    from gme_tpu.utils import compilation_cache

    compilation_cache.enable()
    pan240 = _load_pan240()
    detail = {"device": str(jax.devices()[0]), "method": METHOD}
    results = {}
    for name in ("240p", "480p", "720p"):
        frames = pan240 if name == "240p" else _upscale(pan240, SIZES[name])
        batch = {"240p": 32, "480p": 16, "720p": 8}[name]
        fps, dt, walls, psnrs, n_pairs = _run_resolution(frames, batch)
        results[name] = fps
        detail[name] = {
            "pairs_per_s": round(fps, 3),
            "vs_baseline": round(fps / BASELINES[name], 2),
            "wall_s": round(dt, 3),
            "walls_s": [round(w, 3) for w in walls],
            "n_pairs": int(n_pairs),
            "psnr_avg": round(float(psnrs.mean()), 3),
            "psnr_min": round(float(psnrs.min()), 3),
            "psnr_max": round(float(psnrs.max()), 3),
        }
        print(json.dumps({name: detail[name]}), file=sys.stderr)

    # Headline: the 720p north-star (BASELINE.json >=50x => >=9.57 pairs/s).
    print(
        json.dumps(
            {
                "metric": "gme_pipeline_pairs_per_s_pan720",
                "value": round(results["720p"], 3),
                "unit": "pairs/s/chip",
                "vs_baseline": round(results["720p"] / BASELINES["720p"], 2),
                "method": METHOD,
            }
        )
    )
    print(json.dumps({"detail": detail}), file=sys.stderr)


if __name__ == "__main__":
    main()
