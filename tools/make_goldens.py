"""Generate golden parity fixtures by running the reference implementation.

Run once at build time (requires /root/reference and OpenCV); outputs small
.npz files under tests/goldens/ that the test suite checks against, so the
tests themselves never depend on the reference repo.

Usage: python tools/make_goldens.py
"""

import os
import sys

import numpy as np

np.infty = np.inf  # numpy 2.0 shim for the reference code

REF = "/root/reference/global_motion_estimation"
sys.path.insert(0, REF)

import bbme as ref_bbme  # noqa: E402
import motion as ref_motion  # noqa: E402
import utils as ref_utils  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
os.makedirs(OUT, exist_ok=True)


def synth_pair(rng, H, W, shift=(2, -3), noise=8):
    prev = rng.randint(0, 256, (H, W), np.uint8)
    curr = np.roll(prev, shift, (0, 1))
    curr = np.clip(curr.astype(int) + rng.randint(-noise, noise + 1, (H, W)), 0, 255)
    return prev, curr.astype(np.uint8)


def main():
    rng = np.random.RandomState(1234)

    # --- BBME motion fields for all procedures/pnorms on synthetic frames ---
    prev, curr = synth_pair(rng, 48, 64)
    fields = {"prev": prev, "curr": curr}
    for sp in range(4):
        for pn in range(2):
            for bs, sw in [(4, 2), (8, 4), (12, 8)]:
                mf = ref_bbme.get_motion_field(
                    prev, curr, block_size=bs, search_window=sw,
                    searching_procedure=sp, pnorm_distance=pn,
                )
                fields[f"mf_sp{sp}_pn{pn}_bs{bs}_sw{sw}"] = mf
    np.savez_compressed(os.path.join(OUT, "bbme_synthetic.npz"), **fields)

    # --- hierarchical BBME wrapper ---
    hprev, hcurr = synth_pair(rng, 80, 96, shift=(4, -2))
    hier = ref_bbme.hierarchical_wrapper(
        hprev, hcurr, block_size=10, search_window=4, searching_procedure=3
    )
    np.savez_compressed(
        os.path.join(OUT, "hierarchical_bbme.npz"),
        prev=hprev, curr=hcurr, field=np.asarray(hier, np.float64),
    )

    # --- pan240 real-frame pipeline goldens ---
    video = os.path.join(REF, "resources", "videos", "pan240.mp4")
    frames = ref_utils.get_video_frames(video)
    pairs = [(10, 11), (60, 61), (150, 151)]
    data = {}
    for a, b in pairs:
        prev, curr = frames[a], frames[b]
        params = ref_motion.global_motion_estimation(prev, curr)
        shape = (prev.shape[0] // 16, prev.shape[1] // 16, 2)
        mf = ref_motion.get_motion_field_affine(shape, params)
        comp = ref_motion.compensate_frame(prev, mf)
        ps = complex(ref_utils.PSNR(curr, comp)).real
        data[f"prev_{a}_{b}"] = prev
        data[f"curr_{a}_{b}"] = curr
        data[f"params_{a}_{b}"] = np.asarray(params, np.float64)
        data[f"mf_{a}_{b}"] = mf
        data[f"comp_{a}_{b}"] = comp
        data[f"psnr_{a}_{b}"] = np.float64(ps)
        # pyramid golden for the first pair
        if (a, b) == (10, 11):
            for li, img in enumerate(ref_utils.get_pyramids(prev)):
                data[f"pyr_{li}"] = img
    np.savez_compressed(os.path.join(OUT, "pan240_pipeline.npz"), **data)

    # --- warp/compensation goldens on random fields ---
    wf = rng.randint(0, 256, (64, 80), np.uint8)
    mf = rng.randint(-6, 7, (4, 5, 2)).astype(np.int16)
    comp = ref_motion.compensate_frame(wf, mf)
    np.savez_compressed(
        os.path.join(OUT, "warp.npz"), frame=wf, mf=mf, comp=comp
    )

    # --- affine fit goldens (non-robust + robust) on synthetic frames ---
    aprev, acurr = synth_pair(rng, 64, 80, shift=(1, 2), noise=4)
    p_nonrobust = ref_motion.best_affine_parameters(aprev, acurr)
    old = np.array([1.0, 0.0, 0.0, -2.0, 0.0, 0.0], np.float32)
    p_robust = ref_motion.best_affine_parameters_robust(aprev, acurr, old.copy())
    np.savez_compressed(
        os.path.join(OUT, "affine_fit.npz"),
        prev=aprev, curr=acurr,
        nonrobust=np.asarray(p_nonrobust, np.float64),
        old=old,
        robust=np.asarray(p_robust, np.float64),
    )

    print("goldens written to", OUT)
    for f in sorted(os.listdir(OUT)):
        print(" ", f, os.path.getsize(os.path.join(OUT, f)), "bytes")


if __name__ == "__main__":
    main()
