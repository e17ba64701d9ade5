"""RealEstate10kDataset: window enumeration, end clamping, split files
(re10k_dataset.py:_full_split:82-93, _load_split:102-115,
_index_to_seq_ids:156-168)."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image


def _make_seq(root, split, seq, n, start_ts=1000000):
    frames = root / "frames_720" / split / seq
    frames.mkdir(parents=True)
    ts = np.arange(n, dtype=np.int64) * 1000 + start_ts  # microseconds
    for t in ts:
        Image.new("RGB", (64, 36), (128, 64, 32)).save(frames / f"{int(t) // 1000}.jpg")
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 0.1
    intr = np.tile(np.array([0.8, 1.2, 0.5, 0.5], np.float32), (n, 1))
    return {"timestamps": ts, "poses": poses, "intrinsics": intr}


@pytest.fixture
def re10k_root(tmp_path):
    data = {
        "seqA": _make_seq(tmp_path, "test", "seqA", 8),
        "seqB": _make_seq(tmp_path, "test", "seqB", 2, start_ts=5000000),
    }
    with open(tmp_path / "test.pickle", "wb") as f:
        pickle.dump(data, f)
    return tmp_path


def test_full_split_window_count_and_clamp(re10k_root):
    from scenedino_tpu.datasets.re10k import RealEstate10kDataset

    ds = RealEstate10kDataset(
        data_path=str(re10k_root / "test.pickle"),
        image_size=(18, 32), frame_count=3, dilation=2,
    )
    # full-split subsamples ::10 -> seqA has ceil(8/10)=1 frame, seqB 1:
    # both below sub=(3-1)*2=4 -> no datapoints. Rebuild without subsample
    # via a split file covering seqA instead.
    assert len(ds) == 0

    split = re10k_root / "pairs.txt"
    # timestamps in milliseconds (int(ts/1000))
    with open(split, "w") as f:
        f.write("seqA 1000 1005\n")  # us 1000000 (id 0) and 1005000 (id 5)
    ds2 = RealEstate10kDataset(
        data_path=str(re10k_root / "test.pickle"), split_path=str(split),
        image_size=(18, 32), frame_count=2,
    )
    assert len(ds2) == 1
    out = ds2[0]
    assert out["imgs"].shape == (2, 3, 18, 32)
    # the two poses are the exact frames named by the split line; the
    # pickle stores w2c with x = 0.0 / 0.5, so c2w translation is negated
    assert out["poses"][0][0, 3] == pytest.approx(0.0)
    assert out["poses"][1][0, 3] == pytest.approx(-0.5)


def test_full_split_enumerates_and_clamps_without_subsample(re10k_root):
    """Window mode on un-subsampled data: one datapoint per frame except
    the last; the final windows clamp to the sequence end."""
    from scenedino_tpu.datasets import re10k as R

    ds = R.RealEstate10kDataset(
        data_path=str(re10k_root / "test.pickle"),
        image_size=(18, 32), frame_count=3, dilation=1,
    )
    # emulate has_split=True data (no ::10) by rebuilding datapoints on raw data
    with open(re10k_root / "test.pickle", "rb") as f:
        raw = pickle.load(f)
    ds._seq_data = raw
    ds._datapoints = [("seqA", i) for i in range(len(raw["seqA"]["timestamps"]) - 1)]
    assert len(ds) == 7
    out = ds[6]  # window 6,7,8 -> clamps 8 to 7 (c2w = negated w2c x)
    assert out["poses"][1][0, 3] == pytest.approx(-0.7)
    assert out["poses"][2][0, 3] == pytest.approx(-0.7)  # clamped repeat
