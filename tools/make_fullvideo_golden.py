"""Generate the FULL-VIDEO reference-parity golden: per-pair PSNR records.

Runs the reference pipeline's compute path (global_motion_estimation ->
affine dense field -> compensate_frame -> PSNR, exactly the per-pair body of
/root/reference/global_motion_estimation/results.py:41-112, FRAME_DISTANCE=1)
over ALL 206 frame pairs of the committed pan240.mp4 fixture, and stores the
per-pair PSNR values plus the fitted parameters as a golden npz.

tests/test_pipeline.py diffs the framework's psnr_records against this
record-for-record (|delta| < 0.2 dB per pair, not just the mean), closing
the gap between "3-pair spot parity" and "full-video parity".

Run once at build time (requires /root/reference and OpenCV):
    python tools/make_fullvideo_golden.py
"""

import os
import sys
import time

import numpy as np

np.infty = np.inf  # numpy 2.0 shim for the reference code

REF = "/root/reference/global_motion_estimation"
sys.path.insert(0, REF)

import motion as ref_motion  # noqa: E402
import utils as ref_utils  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)
FRAME_DISTANCE = 1


def main():
    video = os.path.join(REF, "resources", "videos", "pan240.mp4")
    frames = ref_utils.get_video_frames(video)
    n = len(frames)
    idxs, psnrs, params_all = [], [], []
    t0 = time.time()
    for idx in range(FRAME_DISTANCE, n):
        previous = frames[idx - FRAME_DISTANCE]
        current = frames[idx]
        params = ref_motion.global_motion_estimation(previous, current)
        mf = ref_motion.get_motion_field_affine(
            (
                previous.shape[0] // ref_motion.BBME_BLOCK_SIZE,
                previous.shape[1] // ref_motion.BBME_BLOCK_SIZE,
                2,
            ),
            parameters=params,
        )
        compensated = ref_motion.compensate_frame(previous, mf)
        ps = complex(ref_utils.PSNR(current, compensated)).real
        idxs.append(idx)
        psnrs.append(ps)
        params_all.append(np.asarray(params, np.float64))
        if idx % 20 == 0:
            el = time.time() - t0
            print(f"{idx}/{n - 1}  psnr={ps:.3f}  ({el:.0f}s)", flush=True)
    np.savez_compressed(
        os.path.join(OUT, "pan240_full_psnr.npz"),
        idx=np.asarray(idxs, np.int32),
        psnr=np.asarray(psnrs, np.float64),
        params=np.stack(params_all),
    )
    print(
        f"wrote pan240_full_psnr.npz: {len(idxs)} pairs, "
        f"avg={np.mean(psnrs):.4f} min={np.min(psnrs):.4f} "
        f"max={np.max(psnrs):.4f} in {time.time() - t0:.0f}s"
    )


if __name__ == "__main__":
    main()
