"""RealEstate10K preprocessing CLIs.

Behavioral parity targets (`/root/reference/datasets/realestate10k/`):
  * `process` — `process_realestate10k.py`: fold the per-sequence camera
    txt files (timestamp + 6 intrinsics + 12 pose floats per line) into
    one `<mode>.pickle` of {seq: {timestamps, intrinsics, poses}},
    skipping sequences listed in `failed_videos_<mode>.txt`.
  * `mine-split` — `process_mine_split.py`: map the Tulsiani et al.
    test/validation_pairs.json entries onto (sequence, frame-index) split
    lines via searchsorted on the pickled timestamps.
  * downloading the videos themselves (`download_realestate10k.py`,
    yt-dlp + ffmpeg) needs network egress — `download` raises with
    instructions.

Usage:
  python -m scenedino_tpu.cli.process_re10k process -m train -d <re10k_root>
  python -m scenedino_tpu.cli.process_re10k mine-split -d <root> -o <out> -s <split_json_dir>
"""
from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def load_seq_data(mode_path: Path, failures_path: Path):
    """process_realestate10k.py:10-45."""
    seq_files = sorted(mode_path.glob("*.txt"))
    failures = set()
    if failures_path.exists():
        failures = set(l.strip() for l in failures_path.read_text().splitlines())

    skipped = 0
    seq_data = {}
    for seq_file in seq_files:
        seq_name = seq_file.stem
        if seq_name in failures:
            skipped += 1
            continue
        raw = np.loadtxt(seq_file, dtype=float, skiprows=1).reshape((-1, 19))
        seq_data[seq_name] = {
            "timestamps": raw[:, 0].astype(int),
            "intrinsics": raw[:, 1:7],
            "poses": raw[:, 7:].reshape((-1, 3, 4)),
        }
    print(f"Skipped {skipped} sequences because the video download had failed.")
    return seq_data


def run_process(args):
    data_path = Path(args.data_path)
    mode = args.mode
    if mode not in ("test", "train"):
        raise ValueError(f"Invalid split mode: {mode}")
    data = load_seq_data(data_path / mode, data_path / f"failed_videos_{mode}.txt")
    with open(data_path / f"{mode}.pickle", "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {data_path / (mode + '.pickle')} with {len(data)} sequences")


def run_mine_split(args):
    """process_mine_split.py:13-62 (Tulsiani et al. pairs)."""
    data_path = Path(args.data_path)
    out_path = Path(args.out_path)
    split_path = Path(args.split_path)
    out_path.mkdir(parents=True, exist_ok=True)

    with open(data_path / "test.pickle", "rb") as f:
        seq_data = pickle.load(f)

    def get_key_id(sample):
        key = sample["sequence_id"]
        if key not in seq_data:
            return None
        timestamp = int(sample["src_img_obj"]["frame_ts"])
        idx = int(np.searchsorted(seq_data[key]["timestamps"], timestamp))
        return key, idx

    for mode in ("val", "test"):
        split_file = "test_pairs.json" if mode == "test" else "validation_pairs.json"
        lines = (split_path / split_file).read_text().splitlines()
        split_data = [json.loads(l) for l in lines if l.strip()]
        pairs = [p for p in map(get_key_id, split_data) if p is not None]
        print(f"{mode}: {len(split_data)} samples, kept {len(pairs)}")
        (out_path / f"{mode}_files.txt").write_text(
            "\n".join(f"{key} {idx}" for key, idx in pairs)
        )


def run_download(args):
    raise NotImplementedError(
        "downloading RealEstate10K needs network egress (yt-dlp + ffmpeg; "
        "see the reference download_realestate10k.py). Download the videos "
        "elsewhere, then run the `process` subcommand on the result."
    )


def main(argv=None):
    ap = argparse.ArgumentParser("RealEstate10K preprocessing")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("process", help="fold camera txts into <mode>.pickle")
    p.add_argument("--mode", "-m", required=True)
    p.add_argument("--data_path", "-d", required=True)
    p.set_defaults(fn=run_process)

    p = sub.add_parser("mine-split", help="build val/test split txts from pairs json")
    p.add_argument("--data_path", "-d", required=True)
    p.add_argument("--out_path", "-o", required=True)
    p.add_argument("--split_path", "-s", required=True)
    p.set_defaults(fn=run_mine_split)

    p = sub.add_parser("download", help="(gated) video download")
    p.set_defaults(fn=run_download)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
