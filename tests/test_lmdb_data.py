"""lmdb_lite format tests + RealVSR dataset lmdb-backend fixture test +
GT sharpening."""
import os.path as osp
import pickle

import numpy as np
import pytest

from realvsr_tpu.data import lmdb_lite


class TestLmdbLite:
    def test_roundtrip_with_branch_and_overflow_pages(self, tmp_path):
        rng = np.random.default_rng(0)
        items = {}
        for i in range(1500):
            k = f"{i:06d}".encode()
            n = 9000 if i % 11 == 0 else 40 + i % 300  # force overflow pages
            items[k] = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        path = str(tmp_path / "env.lmdb")
        lmdb_lite.write_lmdb(path, items.items())
        with lmdb_lite.open(path) as env:
            assert env.entries == len(items)
            with env.begin() as txn:
                for k, v in items.items():
                    assert txn.get(k) == v
                assert txn.get(b"zzz-missing") is None
                got = dict(txn.cursor())
                assert got == items

    def test_empty_and_single_entry(self, tmp_path):
        p1 = str(tmp_path / "empty.lmdb")
        lmdb_lite.write_lmdb(p1, [])
        with lmdb_lite.open(p1) as env:
            assert env.entries == 0
            with env.begin() as txn:
                assert txn.get(b"x") is None
        p2 = str(tmp_path / "one.lmdb")
        lmdb_lite.write_lmdb(p2, [(b"k", b"v")])
        with lmdb_lite.open(p2) as env:
            with env.begin() as txn:
                assert txn.get(b"k") == b"v"

    def test_duplicate_keys_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            lmdb_lite.write_lmdb(str(tmp_path / "d.lmdb"),
                                 [(b"a", b"1"), (b"a", b"2")])


@pytest.fixture
def lmdb_realvsr_fixture(tmp_path):
    """Tiny 2-sequence RealVSR-style lmdb pair (GT + LQ) with raw uint8
    (16, 24, 3) frames, plus the key/remove pickles."""
    rng = np.random.default_rng(7)
    h, w = 16, 24
    keys = []
    frames = {}
    for seq in ("000", "001"):
        for f in range(10):
            key = f"{seq}_{f:05d}"
            keys.append(key)
            frames[key] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for name in ("GT.lmdb", "LQ.lmdb"):
        lmdb_lite.write_lmdb(
            str(tmp_path / name),
            ((k.encode(), v.tobytes()) for k, v in frames.items()))
    with open(tmp_path / "keys.pkl", "wb") as fh:
        pickle.dump({"keys": keys}, fh)
    with open(tmp_path / "remove.pkl", "wb") as fh:
        pickle.dump([], fh)
    return tmp_path, frames, (h, w)


class TestRealVSRLmdbBackend:
    def test_dataset_reads_lmdb(self, lmdb_realvsr_fixture):
        from realvsr_tpu.data.realvsr import RealVSRAllPairDataset

        root, frames, (h, w) = lmdb_realvsr_fixture
        opt = {
            "phase": "train", "interval_list": [1], "random_reverse": False,
            "border_mode": False, "N_frames": 3,
            "dataroot_GT": str(root / "GT.lmdb"),
            "dataroot_LQ": str(root / "LQ.lmdb"),
            "cache_keys": str(root / "keys.pkl"),
            "remove_list": str(root / "remove.pkl"),
            "GT_size": 8, "LQ_size": 8, "use_flip": False, "use_rot": False,
            "color": None, "scale": 1, "max_frame_idx": 9,
            "img_shape": (3, h, w),
        }
        ds = RealVSRAllPairDataset(opt)
        assert ds.data_type == "lmdb"
        sample = ds.get(3, np.random.default_rng(0))
        assert sample["LQs"].shape == (3, 8, 8, 3)
        assert sample["GT"].shape == (3, 8, 8, 3)
        assert sample["LQs"].dtype == np.float32
        assert 0.0 <= sample["LQs"].min() and sample["LQs"].max() <= 1.0

    def test_lmdb_pixel_values_match_source(self, lmdb_realvsr_fixture):
        from realvsr_tpu.data.realvsr import RealVSRDataset

        root, frames, (h, w) = lmdb_realvsr_fixture
        opt = {
            "phase": "val", "interval_list": [1], "random_reverse": False,
            "border_mode": False, "N_frames": 1,
            "dataroot_GT": str(root / "GT.lmdb"),
            "dataroot_LQ": str(root / "LQ.lmdb"),
            "cache_keys": str(root / "keys.pkl"),
            "remove_list": str(root / "remove.pkl"),
            "GT_size": h, "LQ_size": h, "color": None, "scale": 1,
            "max_frame_idx": 9, "img_shape": (3, h, w),
        }
        ds = RealVSRDataset(opt)
        sample = ds.get(5, np.random.default_rng(0))
        key = ds.keys[5]
        # dataset emits RGB (BGR storage flipped), un-cropped at val phase
        expect = frames[key].astype(np.float32)[..., ::-1] / 255.0
        np.testing.assert_allclose(sample["LQs"][0], expect)


class TestSharpen:
    def test_sharpen_shapes_and_determinism(self):
        from realvsr_tpu.data.sharpen import sharpen_gt, unsharp_mask_gd

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        out1 = unsharp_mask_gd(img, np.random.default_rng(3))
        out2 = unsharp_mask_gd(img, np.random.default_rng(3))
        np.testing.assert_array_equal(out1, out2)
        assert out1.shape == img.shape and out1.dtype == np.uint8
        assert not np.array_equal(out1, img)  # sharpening changed pixels
        # threshold 0 → passthrough
        np.testing.assert_array_equal(
            sharpen_gt(img, np.random.default_rng(1), threshold=0.0), img)
