"""Native C++ JPEG decoder tests (skipped when the toolchain is absent)."""

import os

import numpy as np
import pytest

from vqa_tpu.data.images import decode_batch
from vqa_tpu.native import decode_batch_native, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native decoder not built")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        # smooth gradient + noise: realistic-ish compressible content
        g = np.linspace(0, 255, 320, dtype=np.uint8)
        img = np.stack([np.tile(g, (240, 1))] * 3, axis=-1)
        img = np.clip(img.astype(int) + rng.integers(-20, 20, img.shape), 0, 255)
        p = root / f"im{i}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(p, quality=90)
        paths.append(str(p))
    return paths


class TestNativeDecoder:
    def test_shapes_and_status(self, jpegs):
        out, ok = decode_batch_native(jpegs, 128, threads=2)
        assert out.shape == (8, 128, 128, 3) and out.dtype == np.uint8
        assert ok.all()

    def test_close_to_pil(self, jpegs):
        out, _ = decode_batch_native(jpegs, 128, threads=2)
        pil = decode_batch(jpegs, 128, backend="pil")
        # different DCT method + resampler: close but not identical
        diff = np.abs(out.astype(int) - pil.astype(int)).mean()
        assert diff < 12.0, f"native decode far from PIL: mean abs diff {diff}"

    def test_missing_file_status(self, jpegs):
        out, ok = decode_batch_native([jpegs[0], "/nonexistent/x.jpg"], 64)
        assert ok.tolist() == [True, False]
        assert out[1].max() == 0

    def test_auto_backend_with_fallback(self, jpegs, tmp_path):
        # auto backend routes jpegs natively; missing file -> synthetic fallback
        paths = jpegs[:2] + [str(tmp_path / "missing.jpg")]
        out = decode_batch(paths, 64, backend="auto", synthetic_fallback=True)
        assert out.shape == (3, 64, 64, 3)
        assert out[2].max() > 0  # synthetic image substituted

    def test_native_mp_backend_matches_native(self, jpegs):
        """The subprocess-pool backend returns the same bytes as the
        threaded native decoder (same codepath per worker)."""
        mp_out = decode_batch(jpegs, 128, backend="native_mp", native_threads=2)
        th_out = decode_batch(jpegs, 128, backend="native", native_threads=2)
        assert (mp_out == th_out).all()

    def test_native_mp_error_then_recovery(self, jpegs):
        """A worker-reported error surfaces as RuntimeError and poisons the
        pool; the next call respawns workers and succeeds (images.py
        decode_batch drops _MP_POOL on failure)."""
        import pytest

        from vqa_tpu.data import images

        with pytest.raises(RuntimeError, match="decode worker"):
            decode_batch([jpegs[0], "/nonexistent/x.jpg"], 64,
                         backend="native_mp", native_threads=2,
                         synthetic_fallback=False)
        assert images._MP_POOL is None  # poisoned pool dropped
        out = decode_batch(jpegs, 64, backend="native_mp", native_threads=2)
        assert out.shape == (len(jpegs), 64, 64, 3)
