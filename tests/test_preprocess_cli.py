"""Tests for the KITTI-360 preprocessing CLIs (preprocess_kitti_360.py /
compute_kitti_360_bbox_split.py parity)."""
import numpy as np

from scenedino_tpu.cli.preprocess_kitti_360 import CUT, _write_png, main


def _touch(p):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"")


def test_bbox_split_matches_reference_semantics(tmp_path):
    data = tmp_path / "kitti"
    seq = "2013_05_28_drive_0000_sync"
    sem = data / "data_2d_semantics" / "train"
    sem.mkdir(parents=True)

    n_train, n_val = 6, 45
    train_lines = [
        f"data_2d_raw/{seq}/image_00/data_rect/{i:010d}.png seg/{i:010d}.png"
        for i in range(n_train)
    ]
    val_lines = [
        f"data_2d_raw/{seq}/image_00/data_rect/{100 + i:010d}.png seg/{100 + i:010d}.png"
        for i in range(n_val)
    ]
    (sem / "2013_05_28_drive_train_frames.txt").write_text("\n".join(train_lines))
    (sem / "2013_05_28_drive_val_frames.txt").write_text("\n".join(val_lines))

    # integrity: create raw pngs for all but train frame 3 (-> invalid)
    for i in range(n_train):
        if i == 3:
            continue
        _touch(data / "data_2d_raw" / seq / "image_00" / "data_rect" / f"{i:010d}.png")
        _touch(data / "data_2d_raw" / seq / "image_02" / "data_rgb" / f"{i:010d}.png")
    for i in range(n_val):
        _touch(data / "data_2d_raw" / seq / "image_00" / "data_rect" / f"{100 + i:010d}.png")
        _touch(data / "data_2d_raw" / seq / "image_02" / "data_rgb" / f"{100 + i:010d}.png")

    out = tmp_path / "splits"
    main(["bbox-split", "-d", str(data), "-o", str(out), "--offset", "20"])

    train = (out / "train_files.txt").read_text().splitlines()
    val = (out / "val_files.txt").read_text().splitlines()
    test = (out / "test_files.txt").read_text().splitlines()

    # 5 valid train frames x l/r entries
    assert len(train) == 10
    assert train[0] == f"{seq} 0000000000 l" and train[1] == f"{seq} 0000000000 r"
    # every 20th val frame becomes test -> indices 0, 20, 40 (3 frames),
    # then the CUT list drops test indices {0, ...} -> CUT[0]=7 > 2 keeps all 3
    kept = [i for i in range(3) if i not in CUT]
    assert len(test) == len(kept)
    assert len(val) == n_val - 3
    assert all(line.endswith(" l") for line in val + test)


def test_write_png_roundtrip(tmp_path):
    from PIL import Image

    img = np.linspace(-1, 1, 3 * 8 * 6, dtype=np.float32).reshape(3, 8, 6)
    p = tmp_path / "x.png"
    _write_png(p, img)
    back = np.asarray(Image.open(p)).astype(np.float32) / 255.0 * 2 - 1
    assert back.shape == (8, 6, 3)
    np.testing.assert_allclose(back, img.transpose(1, 2, 0), atol=2 / 255 * 2)


def test_re10k_process_and_mine_split(tmp_path):
    """process_realestate10k.py + process_mine_split.py parity on a
    synthetic camera-txt tree."""
    import json
    import pickle

    from scenedino_tpu.cli.process_re10k import main as re10k_main

    root = tmp_path / "re10k"
    (root / "test").mkdir(parents=True)

    def write_seq(name, timestamps):
        lines = ["https://example/video"]
        for t in timestamps:
            vals = [str(t)] + [f"{v:.6f}" for v in np.arange(18) * 0.1]
            lines.append(" ".join(vals))
        (root / "test" / f"{name}.txt").write_text("\n".join(lines))

    write_seq("seqA", [100, 200, 300])
    write_seq("seqB", [50, 150])
    write_seq("seqBad", [1, 2])
    (root / "failed_videos_test.txt").write_text("seqBad\n")

    re10k_main(["process", "-m", "test", "-d", str(root)])
    with open(root / "test.pickle", "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"seqA", "seqB"}
    np.testing.assert_array_equal(data["seqA"]["timestamps"], [100, 200, 300])
    assert data["seqA"]["poses"].shape == (3, 3, 4)
    assert data["seqA"]["intrinsics"].shape == (3, 6)

    # mine-split: map pairs json onto (seq, searchsorted-index)
    splits = tmp_path / "pairs"
    splits.mkdir()
    pairs = [
        {"sequence_id": "seqA", "src_img_obj": {"frame_ts": "200"}},
        {"sequence_id": "seqMissing", "src_img_obj": {"frame_ts": "1"}},
    ]
    (splits / "test_pairs.json").write_text("\n".join(json.dumps(p) for p in pairs))
    (splits / "validation_pairs.json").write_text(json.dumps(pairs[0]))
    out = tmp_path / "out_splits"
    re10k_main(["mine-split", "-d", str(root), "-o", str(out), "-s", str(splits)])
    assert (out / "test_files.txt").read_text() == "seqA 1"
    assert (out / "val_files.txt").read_text() == "seqA 1"


def test_re10k_download_writes_manifest(tmp_path, monkeypatch):
    """`download` builds the full worklist (url grouping, microsecond ->
    ffmpeg HH:MM:SS.mmm seeks per download_realestate10k.py:38-47, output
    frame paths) and stops cleanly when yt-dlp/ffmpeg are absent — only
    the fetch itself needs egress."""
    import json
    import shutil

    from scenedino_tpu.cli.process_re10k import main as re10k_main

    root = tmp_path / "re10k"
    (root / "train").mkdir(parents=True)

    def write_seq(name, url, timestamps):
        lines = [url]
        for t in timestamps:
            vals = [str(t)] + [f"{v:.6f}" for v in np.arange(18) * 0.1]
            lines.append(" ".join(vals))
        (root / "train" / f"{name}.txt").write_text("\n".join(lines))

    # two sequences share one video (the grouping the reference's Data
    # class performs), a third has its own
    write_seq("seqA", "https://example/v1", [3_723_456_000, 100_000])
    write_seq("seqB", "https://example/v1", [500_000])
    write_seq("seqC", "https://example/v2", [61_000_000])

    monkeypatch.setattr(shutil, "which", lambda _: None)  # no yt-dlp/ffmpeg
    re10k_main(["download", "-m", "train", "-d", str(root)])

    manifest = json.loads((root / "download_manifest_train.json").read_text())
    by_url = {v["url"]: v for v in manifest}
    assert set(by_url) == {"https://example/v1", "https://example/v2"}
    assert [s["name"] for s in by_url["https://example/v1"]["sequences"]] == ["seqA", "seqB"]
    fA = by_url["https://example/v1"]["sequences"][0]["frames"]
    # 3_723_456_000 us = 3_723_456 ms = 1h 2m 3s 456ms
    assert fA[0]["seek"] == "01:02:03.456"
    assert fA[1]["seek"] == "00:00:00.100"
    assert fA[0]["out"].endswith("frames/train/seqA/3723456000.jpg")
    assert by_url["https://example/v2"]["sequences"][0]["frames"][0]["seek"] == "00:01:01.000"
