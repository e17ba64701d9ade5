"""RealEstate10K preprocessing CLIs.

Behavioral parity targets (`/root/reference/datasets/realestate10k/`):
  * `process` — `process_realestate10k.py`: fold the per-sequence camera
    txt files (timestamp + 6 intrinsics + 12 pose floats per line) into
    one `<mode>.pickle` of {seq: {timestamps, intrinsics, poses}},
    skipping sequences listed in `failed_videos_<mode>.txt`.
  * `mine-split` — `process_mine_split.py`: map the Tulsiani et al.
    test/validation_pairs.json entries onto (sequence, frame-index) split
    lines via searchsorted on the pickled timestamps.
  * `download` — `download_realestate10k.py`: everything EXCEPT the
    fetch runs on any box: parse all per-sequence camera txts, group
    sequences by YouTube URL, convert the microsecond timestamps to
    ffmpeg `-ss HH:MM:SS.mmm` seek strings (reference `process()`:38-47)
    and write a `download_manifest_<mode>.json` worklist (one entry per
    video: url, sequences, per-frame seek + output path). When yt-dlp
    AND ffmpeg are on PATH the worklist is then executed (360p stream,
    failures appended to `failed_videos_<mode>.txt` exactly like the
    reference); otherwise the command stops after the manifest with
    instructions — only the fetch itself needs egress.

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


def _seek_string(timestamp_us: int) -> str:
    """RE10K timestamp (microseconds) -> ffmpeg HH:MM:SS.mmm seek
    (download_realestate10k.py:38-47: `int(timestamp / 1000)` then
    hour/min/sec/milli splits of the millisecond value)."""
    ms = int(timestamp_us / 1000)
    return (
        f"{int(ms / 3600000):02d}:{int(ms % 3600000 / 60000):02d}:"
        f"{int(ms % 3600000 % 60000 / 1000):02d}.{int(ms % 3600000 % 60000 % 1000):03d}"
    )


def build_download_manifest(mode_path: Path, out_root: Path):
    """Group sequences by video URL into an executable worklist
    (download_realestate10k.py:60-102 DataDownloader.__init__ semantics:
    first line of each txt is the URL, remaining lines start with the
    frame timestamp)."""
    videos = {}
    for txt_file in sorted(mode_path.glob("*.txt")):
        lines = txt_file.read_text().splitlines()
        if not lines:
            continue
        url = lines[0].strip()
        timestamps = [int(l.split(" ")[0]) for l in lines[1:] if l.strip()]
        entry = videos.setdefault(url, {"url": url, "sequences": []})
        entry["sequences"].append(
            {
                "name": txt_file.stem,
                "frames": [
                    {
                        "timestamp": t,
                        "seek": _seek_string(t),
                        "out": str(out_root / txt_file.stem / f"{t}.jpg"),
                    }
                    for t in timestamps
                ],
            }
        )
    return list(videos.values())


def run_download(args):
    import shutil
    import subprocess

    data_path = Path(args.data_path)
    mode = args.mode
    mode_path = data_path / mode
    if not mode_path.is_dir():
        raise FileNotFoundError(f"no camera-txt dir at {mode_path}")
    out_root = Path(args.out_path) if args.out_path else data_path / "frames" / mode
    manifest = build_download_manifest(mode_path, out_root)
    manifest_path = data_path / f"download_manifest_{mode}.json"
    manifest_path.write_text(json.dumps(manifest, indent=1))
    n_seqs = sum(len(v["sequences"]) for v in manifest)
    print(f"wrote {manifest_path}: {len(manifest)} videos / {n_seqs} sequences")

    ytdlp, ffmpeg = shutil.which("yt-dlp"), shutil.which("ffmpeg")
    if not (ytdlp and ffmpeg):
        print(
            "yt-dlp and/or ffmpeg not on PATH — stopping after the manifest "
            "(the fetch needs network egress). On a connected box, re-run "
            "this command or execute the manifest directly: per video, "
            "`yt-dlp -f 'bv*[height<=360]' -o <tmp> <url>`, then per frame "
            "`ffmpeg -ss <seek> -i <tmp> -vframes 1 -f image2 <out>`, then "
            "run the `process` subcommand."
        )
        return
    failed_path = data_path / f"failed_videos_{mode}.txt"
    tmp = data_path / f"current_{mode}.mp4"
    for video in manifest:
        tmp.unlink(missing_ok=True)
        try:
            subprocess.run(
                [ytdlp, "-f", "bv*[height<=360]", "-o", str(tmp), video["url"]],
                check=True,
            )
        except subprocess.CalledProcessError:
            # reference behavior: record every sequence of the failed video
            with open(failed_path, "a") as f:
                for seq in video["sequences"]:
                    f.write(seq["name"] + "\n")
            continue
        for seq in video["sequences"]:
            for frame in seq["frames"]:
                Path(frame["out"]).parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    [ffmpeg, "-ss", frame["seek"], "-i", str(tmp), "-vframes",
                     "1", "-f", "image2", frame["out"]],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
    tmp.unlink(missing_ok=True)


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

    p = sub.add_parser(
        "download",
        help="build the video download manifest; fetch when yt-dlp+ffmpeg exist",
    )
    p.add_argument("--mode", "-m", required=True)
    p.add_argument("--data_path", "-d", required=True)
    p.add_argument("--out_path", "-o", default=None)
    p.set_defaults(fn=run_download)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
