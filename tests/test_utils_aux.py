"""Aux subsystem tests: plotting, profiling timer, utils surface, VGG tool."""

import os

import numpy as np
import pytest


class TestUtilsSurface:
    def test_reference_names_importable(self):
        from vqa_tpu import utils
        for name in ("preprocess_text", "pad_sequences", "build_vocab",
                     "build_answer", "save_vocab", "load_vocab",
                     "filter_samples_by_label", "plot_data", "print_and_log",
                     "str2bool", "int_min_two"):
            assert callable(getattr(utils, name))

    def test_flag_coercers(self):
        from vqa_tpu.utils import int_min_two, str2bool
        assert str2bool("True") is True and str2bool("false") is False
        with pytest.raises(AssertionError):
            str2bool("yes")
        assert int_min_two("5") == 5
        with pytest.raises(AssertionError):
            int_min_two(1)


class TestPlotData:
    def test_saves_figures(self, tmp_path):
        from vqa_tpu.utils import plot_data

        batches = [{
            "image": np.random.default_rng(0).integers(
                0, 255, (2, 32, 32, 3), dtype=np.uint8),
            "question": np.array([[2, 3, 0], [4, 5, 6]]),
            "label": np.array([0, 1]),
        }]
        idx2word = {0: "<PAD>", 2: "is", 3: "cat", 4: "what", 5: "dog", 6: "doing"}
        idx2label = {0: "UNKNOWN", 1: "yes"}
        figs = plot_data(iter(batches), idx2word, idx2label, num_plots=1,
                         save_dir=str(tmp_path))
        assert len(figs) == 1
        assert os.path.exists(tmp_path / "sample_0.png")


class TestStepTimer:
    def test_rates(self):
        import time
        from vqa_tpu.train.profiling import StepTimer

        t = StepTimer(batch_size=10)
        assert t.steps_per_sec == 0.0
        for _ in range(3):
            t.tick()
            time.sleep(0.01)
        assert t.steps_per_sec > 0
        assert t.qa_pairs_per_sec == pytest.approx(t.steps_per_sec * 10)
        assert "steps/s" in t.summary()


class TestConvertVGGTool:
    def test_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "tools")
        from tests.test_torch_parity import build_torch_vgg11_bn
        import convert_vgg

        m = build_torch_vgg11_bn()
        src = tmp_path / "vgg.pth"
        torch.save(m.state_dict(), str(src))
        dst = tmp_path / "vgg.npz"
        convert_vgg.main([str(src), str(dst)])
        data = np.load(str(dst))
        assert any(k.startswith("params/features/conv0") for k in data.files)
        assert any(k.startswith("batch_stats/") for k in data.files)


class TestSyncedRateTracker:
    def test_rate_from_sync_deltas(self):
        import time
        from vqa_tpu.train.profiling import SyncedRateTracker

        t = SyncedRateTracker(batch_size=4)
        assert t.qa_pairs_per_sec == 0.0
        t.mark(0)
        time.sleep(0.05)
        t.mark(10)
        assert 0 < t.steps_per_sec < 10 / 0.04
        assert t.qa_pairs_per_sec == pytest.approx(t.steps_per_sec * 4)
        assert "QA-pairs/s" in t.summary()
