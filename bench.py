"""Benchmark: full results-pipeline throughput (pairs/s) on one chip,
swept over 240p / 480p / 720p.

Runs the complete per-pair GME pipeline (3-level pyramid, dense diamond
init, hierarchical robust affine fit, dense field, compensation, PSNR) over
whole videos as batched device programs:

- 240p: the reference's committed fixture pan240.mp4 (320x240, 206 pairs).
- 480p / 720p: cubic upscales of pan240 (the BASELINE.md methodology — the
  reference CPU 720p number was measured on exactly such an upscale).

Measurement methodology (stated in the emitted JSON; every pitfall below
was measured on this box, see docs/performance.md):

- the device relay memoizes repeated (executable, input) dispatches, so no
  timed pass reuses content the relay has seen: warm-up runs on pixel-offset
  variants (+191/+193 mod 256 — uint8 addition wraps, preserving shapes and
  motion geometry while making every frame's bytes unique), pass 1 times the
  REAL video, passes 2..3 time +85/+170 variants; headline = median.
- `jax.block_until_ready` does NOT wait for relay execution; only fetching
  values does.  Each timed pass dispatches every batch, then drains the
  per-pair PSNR + escape-diagnostic scalars — so the wall includes real
  execution plus the (small) result fetches.
- the timed program returns ONLY those scalars: shipping the image streams
  to the host runs at the dev tunnel's ~MB/s and would measure the tunnel,
  not the chip (the results driver overlaps that I/O with compute; on a
  production host D2H is PCIe).  The images are still COMPUTED on device —
  XLA cannot dead-code them away because psnr depends on the compensated
  frame (and the driver path writes them, tested for parity separately).
- warm-up runs TWICE: the relay's first execution of a fresh executable
  pays a large one-time server-side cost.

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
    "cold-data whole-video passes; 2x warm-up on +191/+193 pixel-offset "
    "variants (relay memoizes repeated dispatches and first-executes "
    "slowly); timed passes over never-dispatched content (pass1 = real "
    "video, then +85/+170 variants), wall = dispatch all batches + drain "
    "per-pair psnr/diagnostic scalars (block_until_ready does not force "
    "relay execution; value fetches do); headline = median pass"
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


def _run_resolution(frames: np.ndarray, batch: int):
    import jax
    import jax.numpy as jnp

    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import gme_pipeline_batch

    cfg = GMEConfig()
    n_pairs = frames.shape[0] - 1
    device_frames = jax.block_until_ready(jnp.asarray(frames))

    @jax.jit
    def step(prev, curr):
        out = gme_pipeline_batch(prev, curr, cfg)
        # One (2, B) f32 drain per batch: psnr + the escape diagnostic
        # (exact — counts are small integers), halving fetch round trips.
        return jnp.stack(
            [out["psnr"], out["volume_edge_hits"].astype(jnp.float32)]
        )

    def one_pass(offset):
        src = device_frames + jnp.uint8(offset)
        t0 = time.perf_counter()
        outs = []
        for lo in range(0, n_pairs, batch):
            idx = np.arange(lo, min(lo + batch, n_pairs))
            if len(idx) < batch:  # pad to keep one compiled shape
                idx = np.concatenate([idx, np.full(batch - len(idx), n_pairs - 1)])
            outs.append(step(src[idx], src[idx + 1]))
        drained = np.concatenate([np.asarray(o) for o in outs], axis=1)
        psnr = drained[0, :n_pairs]
        hits = drained[1, :n_pairs].astype(np.int64)
        return time.perf_counter() - t0, psnr, hits

    one_pass(191)  # warm-up 1: server-side first execution of the program
    one_pass(193)  # warm-up 2: steady state
    walls = []
    psnr = hits = None
    for rep, off in enumerate((0, 85, 170)):  # rep 0 == the real video
        w, p, h = one_pass(off)
        walls.append(w)
        if rep == 0:
            psnr, hits = p, h
    dt = float(np.median(walls))
    return n_pairs / dt, dt, walls, psnr, hits, n_pairs


def main():
    import jax

    from gme_tpu.utils import compilation_cache

    compilation_cache.enable()
    pan240 = _load_pan240()
    detail = {"device": str(jax.devices()[0]), "method": METHOD}
    results = {}
    for name in ("240p", "480p", "720p"):
        frames = pan240 if name == "240p" else _upscale(pan240, SIZES[name])
        batch = {"240p": 206, "480p": 103, "720p": 24}[name]
        fps, dt, walls, psnrs, hits, n_pairs = _run_resolution(frames, batch)
        results[name] = fps
        detail[name] = {
            "pairs_per_s": round(fps, 3),
            "vs_baseline": round(fps / BASELINES[name], 2),
            "wall_s": round(dt, 3),
            "walls_s": [round(w, 3) for w in walls],
            "n_pairs": int(n_pairs),
            "batch": batch,
            "psnr_avg": round(float(psnrs.mean()), 3),
            "psnr_min": round(float(psnrs.min()), 3),
            "psnr_max": round(float(psnrs.max()), 3),
            "radius_ring_visited_pairs": int((hits > 0).sum()),
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
