import json
import os

import numpy as np
import pytest

from gme_tpu.config import GMEConfig, PipelineConfig
from gme_tpu.pipeline.results import process_video, summarize_results


def _make_clip(tmp_path, rng, n=6, H=64, W=80):
    """Tiny synthetic y4m clip with global panning motion."""
    base = rng.randint(0, 256, (H * 2, W * 2), np.uint8)
    frames = []
    for i in range(n):
        frames.append(base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy())
    path = str(tmp_path / "pan_synth.y4m")
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 C420\n".encode())
        for y in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(bytes((W // 2) * (H // 2) * 2))
    return path


def test_process_video_end_to_end(tmp_path, rng):
    clip = _make_clip(tmp_path, rng)
    out_root = str(tmp_path / "results")
    cfg = PipelineConfig(batch_size=2)
    summary = process_video(clip, out_root, cfg)

    assert summary["pairs_processed"] == 5
    save = os.path.join(out_root, "pan_synth")
    for stream in (
        "frames",
        "compensated",
        "curr_prev_diff",
        "curr_comp_diff",
        "model_motion_field",
    ):
        files = os.listdir(os.path.join(save, stream))
        assert len(files) == 5, stream
    with open(os.path.join(save, "psnr_records.json")) as f:
        rec = json.load(f)
    assert sorted(rec.keys()) == ["1", "2", "3", "4", "5"]
    assert all(isinstance(v, float) for v in rec.values())
    assert summary["psnr"]["count"] == 5

    rows = summarize_results(out_root)
    assert rows and rows[0]["video"] == "pan_synth"


def test_process_video_resume_skips_done(tmp_path, rng):
    clip = _make_clip(tmp_path, rng)
    out_root = str(tmp_path / "results")
    cfg = PipelineConfig(batch_size=2)
    process_video(clip, out_root, cfg, max_pairs=2)
    summary = process_video(clip, out_root, cfg.replace(resume=True))
    # first run handled pairs 1-2; resumed run only the remaining 3
    assert summary["pairs_processed"] == 3
    with open(os.path.join(out_root, "pan_synth", "psnr_records.json")) as f:
        rec = json.load(f)
    assert sorted(rec.keys()) == ["1", "2", "3", "4", "5"]


def test_frame_distance(tmp_path, rng):
    clip = _make_clip(tmp_path, rng, n=8)
    out_root = str(tmp_path / "results_fd2")
    summary = process_video(clip, out_root, PipelineConfig(frame_distance=2, batch_size=4))
    assert summary["pairs_processed"] == 6
