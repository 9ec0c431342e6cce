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


class _FakeAsyncWriter:
    """Stands in for the native AsyncPNGWriter: holds submissions in a queue
    until drain() — so a missing image-before-record fence leaves recorded
    pairs whose images exist only in the (lost-on-crash) queue."""

    def __init__(self):
        self.queue = []

    def submit(self, path, img):
        self.queue.append((path, np.array(img)))

    def drain(self):
        from gme_tpu.io.writers import write_png

        for path, img in self.queue:
            write_png(path, img)
        self.queue.clear()


def test_images_fenced_before_record(tmp_path, rng, monkeypatch):
    """Crash-consistency invariant of the resume ledger: at every
    records.flush() the image streams of every recorded pair must already
    be ON DISK (not in the async writer queue) — a crash between a flush
    and a drain can then never leave `--resume` skipping pairs whose images
    were lost (the reference writes images synchronously before its record,
    results.py:64-112)."""
    from gme_tpu.io.writers import PSNRRecords
    from gme_tpu.pipeline import results as R

    clip = _make_clip(tmp_path, rng)
    out_root = str(tmp_path / "results_fence")
    fake = _FakeAsyncWriter()
    monkeypatch.setattr(R, "_get_writer", lambda workers=2: fake)

    orig_flush = PSNRRecords.flush
    seen_flushes = []

    def checked_flush(self):
        for idx in self.records:
            for stream, name in (
                ("compensated", int(idx) - 5),
                ("frames", int(idx) - 5),
                ("curr_prev_diff", int(idx)),
                ("curr_comp_diff", int(idx)),
            ):
                p = os.path.join(
                    os.path.dirname(self.path), stream, f"{name}.png"
                )
                assert os.path.exists(p), (
                    f"record {idx} flushed before its {stream} image hit disk"
                )
        seen_flushes.append(len(self.records))
        return orig_flush(self)

    monkeypatch.setattr(PSNRRecords, "flush", checked_flush)
    process_video(clip, out_root, PipelineConfig(batch_size=2))
    assert seen_flushes and seen_flushes[-1] == 5


PAN240 = "/root/reference/global_motion_estimation/resources/videos/pan240.mp4"


def test_full_video_reference_parity(goldens):
    """FULL-VIDEO parity: the framework's per-pair PSNR records over all 206
    pan240 pairs diff record-for-record against the reference pipeline's own
    end-to-end output (reference results.py:41-112, FRAME_DISTANCE=1;
    golden generated by tools/make_fullvideo_golden.py).  Per-pair tolerance
    0.2 dB — a systematic drift on any subset of pairs fails, not just a
    shifted mean (measured: the diff is 0.0000 dB on every pair)."""
    golden = goldens("pan240_full_psnr.npz")
    if not os.path.exists(PAN240):
        pytest.skip("pan240 fixture not present")
    import jax.numpy as jnp

    from gme_tpu.io.video import get_video_frames
    from gme_tpu.models.gme import gme_pipeline_batch

    frames = np.stack(get_video_frames(PAN240))
    cfg = GMEConfig()
    n = frames.shape[0] - 1
    assert n == golden["psnr"].shape[0] == 206
    device = jnp.asarray(frames)
    psnrs, params = [], []
    B = 32
    for lo in range(0, n, B):
        idx = np.arange(lo, min(lo + B, n))
        if len(idx) < B:
            idx = np.concatenate([idx, np.full(B - len(idx), n - 1)])
        out = gme_pipeline_batch(device[idx], device[idx + 1], cfg)
        psnrs.append(np.asarray(out["psnr"]))
        params.append(np.asarray(out["parameters"]))
    psnrs = np.concatenate(psnrs)[:n]
    params = np.concatenate(params)[:n]
    d = np.abs(psnrs - golden["psnr"])
    assert d.max() < 0.2, (
        f"per-pair PSNR drift: max |delta| = {d.max():.4f} dB at pair "
        f"{int(d.argmax())}, {int((d > 0.2).sum())} pairs over tolerance"
    )
    # Fitted parameters track the reference per pair as well.
    pd = np.abs(params - golden["params"]).max()
    assert pd < 5e-3, f"per-pair parameter drift: max |delta| = {pd:.5f}"


def test_streaming_decode_stages(tmp_path, rng):
    """The driver streams decode on a background thread: summary reports
    the concurrent decode time and the (typically much smaller) time the
    main loop actually blocked waiting for frames."""
    clip = _make_clip(tmp_path, rng)
    s = process_video(clip, str(tmp_path / "r_stream"), PipelineConfig(batch_size=2))
    assert "decode" in s["stages"] and "decode_wait" in s["stages"]
    assert s["pairs_processed"] == 5


def test_process_video_adaptive_matches_default(tmp_path, rng):
    """The opt-in adaptive driver path (PipelineConfig.adaptive) produces
    identical psnr records to the default path — the escape-guarded
    two-tier dispatch is bit-transparent (volume engine forced so the
    radii actually matter on the CPU test backend)."""
    clip = _make_clip(tmp_path, rng)
    gme = GMEConfig(search_impl="volume")
    a = process_video(
        clip, str(tmp_path / "r_def"),
        PipelineConfig(batch_size=2, gme=gme),
    )
    b = process_video(
        clip, str(tmp_path / "r_adp"),
        PipelineConfig(batch_size=2, gme=gme, adaptive=True),
    )
    assert a["pairs_processed"] == b["pairs_processed"]
    ra = json.load(open(os.path.join(tmp_path, "r_def", "pan_synth", "psnr_records.json")))
    rb = json.load(open(os.path.join(tmp_path, "r_adp", "pan_synth", "psnr_records.json")))
    assert ra == rb
