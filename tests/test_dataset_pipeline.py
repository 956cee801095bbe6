"""Dataset + input-pipeline tests: tokenization parity, loader determinism,
device-side preprocess."""

import numpy as np
import pytest

from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
from vqa_tpu.data.images import decode_image, synthetic_image
from vqa_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture
def word2idx():
    return {"<PAD>": 0, "<UNKNOWN>": 1, "what": 2, "is": 3, "the": 4, "cat": 5,
            "doing": 6, "black": 7}


@pytest.fixture
def label2idx():
    return {"UNKNOWN": 0, "yes": 1, "no": 2}


@pytest.fixture
def data_file(tmp_path):
    lines = [
        "img1.jpg\tWhat,is,the,cat,doing\tsleeping",
        "img2.jpg\tIs,the,cat,black\tyes",
        "img3.jpg\tIs,the,zebra,striped\tno",
    ]
    f = tmp_path / "data.txt"
    f.write_text("\n".join(lines) + "\n")
    return str(f)


class TestVQASamples:
    def test_tokenization(self, data_file, tmp_path, word2idx, label2idx):
        s = VQASamples(data_file, str(tmp_path), word2idx, label2idx, max_seq_length=6)
        assert len(s) == 3
        assert s.questions[0].tolist() == [2, 3, 4, 5, 6, 0]
        assert s.ques_len[0] == 5
        # unknown words -> <UNKNOWN>=1, still counted in ques_len
        assert s.questions[2].tolist() == [3, 4, 1, 1, 0, 0]
        assert s.ques_len[2] == 4
        # unknown answer -> UNKNOWN label 0
        assert s.labels.tolist() == [0, 1, 2]

    def test_truncation(self, data_file, tmp_path, word2idx, label2idx):
        s = VQASamples(data_file, str(tmp_path), word2idx, label2idx, max_seq_length=3)
        assert s.questions[0].tolist() == [2, 3, 4]
        assert s.ques_len[0] == 3


class TestImages:
    def test_synthetic_deterministic(self):
        a = synthetic_image("x.jpg", 32)
        b = synthetic_image("x.jpg", 32)
        c = synthetic_image("y.jpg", 32)
        assert (a == b).all() and a.shape == (32, 32, 3)
        assert (a != c).any()

    def test_decode_real_file(self, tmp_path):
        from PIL import Image
        p = tmp_path / "t.jpg"
        Image.fromarray(np.full((100, 80, 3), 128, np.uint8)).save(p)
        out = decode_image(str(p), 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    def test_missing_raises_without_fallback(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            decode_image(str(tmp_path / "missing.jpg"), 32)


class TestDataLoader:
    def _loader(self, data_file, tmp_path, word2idx, label2idx, **kw):
        s = VQASamples(data_file, str(tmp_path), word2idx, label2idx, 6)
        kw.setdefault("host_size", 16)
        kw.setdefault("synthetic_images", True)
        kw.setdefault("num_workers", 2)
        return DataLoader(s, batch_size=2, **kw)

    def test_shapes_and_drop_last(self, data_file, tmp_path, word2idx, label2idx):
        dl = self._loader(data_file, tmp_path, word2idx, label2idx)
        batches = list(dl)
        assert len(batches) == 1  # 3 samples, bs=2, drop_last
        b = batches[0]
        assert b["image"].shape == (2, 16, 16, 3) and b["image"].dtype == np.uint8
        assert b["question"].shape == (2, 6)
        assert b["ques_len"].shape == (2,) and b["label"].shape == (2,)

    def test_seed_determinism(self, data_file, tmp_path, word2idx, label2idx):
        b1 = next(iter(self._loader(data_file, tmp_path, word2idx, label2idx, seed=7)))
        b2 = next(iter(self._loader(data_file, tmp_path, word2idx, label2idx, seed=7)))
        assert (b1["question"] == b2["question"]).all()
        assert (b1["image"] == b2["image"]).all()

    def test_epochs_reshuffle(self, data_file, tmp_path, word2idx, label2idx):
        dl = self._loader(data_file, tmp_path, word2idx, label2idx, seed=3)
        orders = [dl._epoch_order().tolist() for _ in range(4)]
        dl._epoch = 1
        assert any(orders[0] != dl._epoch_order().tolist() for _ in range(1))

    def test_set_epoch_matches_uninterrupted_run(self, data_file, tmp_path,
                                                 word2idx, label2idx):
        """Resume contract: a loader positioned at epoch k via set_epoch
        yields exactly the batch order an uninterrupted run sees in its
        (k+1)-th epoch — no silent replay of epoch 0 (SURVEY §5.3)."""
        full = self._loader(data_file, tmp_path, word2idx, label2idx, seed=5)
        for _ in range(2):            # consume epochs 0 and 1
            list(full)
        uninterrupted = [b["question"].tolist() for b in full]  # epoch 2

        resumed = self._loader(data_file, tmp_path, word2idx, label2idx, seed=5)
        resumed.set_epoch(2)
        got = [b["question"].tolist() for b in resumed]
        assert got == uninterrupted

    def test_set_epoch_skip_batches_fast_forwards_once(self, data_file,
                                                       tmp_path, word2idx,
                                                       label2idx):
        """Mid-epoch resume: skip_batches drops exactly the consumed prefix
        of the deterministic epoch order, and ONLY for the next iteration —
        the following epoch is complete again (r3 VERDICT item 4)."""
        full = self._loader(data_file, tmp_path, word2idx, label2idx, seed=5,
                            drop_last=False)
        full.set_epoch(3)
        epoch3 = [b["question"].tolist() for b in full]
        epoch4 = [b["question"].tolist() for b in full]
        assert len(epoch3) >= 2

        resumed = self._loader(data_file, tmp_path, word2idx, label2idx,
                               seed=5, drop_last=False)
        resumed.set_epoch(3, skip_batches=1)
        assert [b["question"].tolist() for b in resumed] == epoch3[1:]
        # one-shot: the next epoch iterates in full
        assert [b["question"].tolist() for b in resumed] == epoch4

    def test_auto_backend_resolution(self, data_file, tmp_path, word2idx,
                                     label2idx, monkeypatch):
        """Real-data loaders resolve 'auto' to the measured-fastest
        native_mp process pool (BASELINE.md r3); synthetic/feature-cache/
        single-worker loaders keep the in-process path."""
        import vqa_tpu.native as native
        monkeypatch.setattr(native, "native_available", lambda: True)
        real = self._loader(data_file, tmp_path, word2idx, label2idx,
                            synthetic_images=False)
        assert real.decode_backend == "native_mp"
        synth = self._loader(data_file, tmp_path, word2idx, label2idx)
        assert synth.decode_backend == "auto"
        single = self._loader(data_file, tmp_path, word2idx, label2idx,
                              synthetic_images=False, num_workers=1)
        assert single.decode_backend == "auto"
        monkeypatch.setattr(native, "native_available", lambda: False)
        nonative = self._loader(data_file, tmp_path, word2idx, label2idx,
                                synthetic_images=False)
        assert nonative.decode_backend == "auto"

    def test_sharding_disjoint_and_equal(self, data_file, tmp_path, word2idx,
                                         label2idx):
        s0 = self._loader(data_file, tmp_path, word2idx, label2idx,
                          shard_index=0, num_shards=2, shuffle=False)
        s1 = self._loader(data_file, tmp_path, word2idx, label2idx,
                          shard_index=1, num_shards=2, shuffle=False)
        o0, o1 = set(s0._epoch_order()), set(s1._epoch_order())
        assert o0.isdisjoint(o1)
        # shards are truncated to EQUAL sizes (unequal shards would
        # desynchronize multi-host step counts): 3 samples -> 1 each
        assert len(o0) == len(o1) == 1
        assert o0 | o1 == {0, 1}


class TestDevicePreprocess:
    def test_resize_normalize(self):
        pre = make_image_preprocessor(image_size=8)
        raw = np.full((2, 16, 16, 3), 255, np.uint8)
        out = np.asarray(pre(raw))
        assert out.shape == (2, 8, 8, 3)
        expected = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)

    def test_no_resize_path(self):
        pre = make_image_preprocessor(image_size=16)
        raw = np.zeros((1, 16, 16, 3), np.uint8)
        out = np.asarray(pre(raw))
        expected = (0.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)


class TestDevicePrefetch:
    def test_order_and_count(self):
        from vqa_tpu.data.pipeline import device_prefetch

        batches = [{"x": np.full((2,), i)} for i in range(5)]
        prepared = []

        def prep(b):
            prepared.append(int(b["x"][0]))
            return {"x": b["x"] * 10}

        out = list(device_prefetch(iter(batches), prep, depth=2))
        assert [int(o["x"][0]) for o in out] == [0, 10, 20, 30, 40]
        assert prepared == [0, 1, 2, 3, 4]

    def test_prepares_ahead(self):
        from vqa_tpu.data.pipeline import device_prefetch

        events = []

        def gen():
            for i in range(3):
                events.append(f"host{i}")
                yield i

        def prep(i):
            events.append(f"prep{i}")
            return i

        g = device_prefetch(gen(), prep, depth=2)
        first = next(g)
        # before the consumer touches batch 0, batch 1 is already prepared
        assert first == 0
        assert "prep1" in events

    def test_short_iterator(self):
        from vqa_tpu.data.pipeline import device_prefetch
        assert list(device_prefetch(iter([1]), lambda x: x + 1, depth=4)) == [2]
        assert list(device_prefetch(iter([]), lambda x: x, depth=2)) == []

    def test_depth_one_passthrough(self):
        from vqa_tpu.data.pipeline import device_prefetch
        assert list(device_prefetch(iter([1, 2, 3]), lambda x: x * 2, depth=1)) == [2, 4, 6]
        assert list(device_prefetch(iter([1, 2]), lambda x: x, depth=0)) == [1, 2]
