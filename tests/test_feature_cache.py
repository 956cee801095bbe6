"""Frozen-backbone feature cache: build, reuse, invalidation, exactness.

The cache must be *invisible* numerically: training on cached features
produces bit-identical logits/losses to recomputing the frozen tower
(vqa_tpu/data/feature_cache.py), because it stores the exact compute-dtype
tensors the encoder emits. These tests run the whole seam: build -> loader
feature batches -> model ``image_is_features`` path -> CLI flag.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.data.dataset import VQASamples
from vqa_tpu.data.feature_cache import (FeatureCache, build_or_open,
                                        variables_fingerprint)
from vqa_tpu.data.pipeline import DataLoader, make_image_preprocessor


@pytest.fixture(scope="module")
def tiny_samples(tmp_path_factory):
    root = tmp_path_factory.mktemp("fc")
    lines = [f"img{i % 5}.jpg\tis,the,cat,black\t{'yes' if i % 2 else 'no'}"
             for i in range(12)]
    data = root / "d.txt"
    data.write_text("\n".join(lines) + "\n")
    word2idx = {"<PAD>": 0, "<UNKNOWN>": 1, "is": 2, "the": 3, "cat": 4,
                "black": 5}
    label2idx = {"UNKNOWN": 0, "yes": 1, "no": 2}
    samples = VQASamples(str(data), str(root), word2idx, label2idx, 6)
    return root, samples


def _encoder(image_size=32, dtype=jnp.float32):
    from vqa_tpu.models.coattention import ImageCoAttentionEncoder

    enc = ImageCoAttentionEncoder(dtype=dtype)
    pre = make_image_preprocessor(image_size, dtype)
    variables = enc.init({"params": jax.random.PRNGKey(0)},
                         pre(np.zeros((1, 8, 8, 3), np.uint8)))

    @jax.jit
    def encode(images_u8):
        return enc.apply(variables, pre(images_u8), False, True)

    return enc, variables, encode


class TestBuildAndReuse:
    def test_build_open_gather(self, tiny_samples, tmp_path):
        root, samples = tiny_samples
        _, variables, encode = _encoder()
        fp = variables_fingerprint(variables)
        cache = build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                              image_size=32, dtype=jnp.float32,
                              boundary="coattn", batch_size=4, host_size=32,
                              num_workers=0, synthetic_images=True)
        assert len(cache.row_of) == 5  # unique images, not samples
        rows = cache.rows(["img0.jpg", "img3.jpg", "img0.jpg"])
        assert rows.shape[0] == 3
        np.testing.assert_array_equal(rows[0], rows[2])

        # identical fingerprint -> reuse (no rebuild); mtime unchanged
        bin_path = None
        for d in os.listdir(tmp_path):
            bin_path = os.path.join(tmp_path, d, "features.bin")
        mtime = os.path.getmtime(bin_path)
        build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                      image_size=32, dtype=jnp.float32, boundary="coattn",
                      batch_size=4, host_size=32, num_workers=0,
                      synthetic_images=True)
        assert os.path.getmtime(bin_path) == mtime

    def test_fingerprint_changes_with_weights(self):
        _, v1, _ = _encoder()
        v2 = jax.tree_util.tree_map(lambda x: x + 1e-3, v1)
        assert variables_fingerprint(v1) != variables_fingerprint(v2)

    def test_different_weights_use_different_cache_dir(self, tiny_samples,
                                                       tmp_path):
        root, samples = tiny_samples
        _, variables, encode = _encoder()
        for fp in ("aaaa", "bbbb"):
            build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                          image_size=32, dtype=jnp.float32, boundary="x",
                          batch_size=4, host_size=32, num_workers=0,
                          synthetic_images=True)
        assert len(os.listdir(tmp_path)) == 2

    def test_distinct_datasets_get_distinct_dirs(self, tiny_samples, tmp_path):
        """Train and val splits must never share (and clobber) a cache dir."""
        root, samples = tiny_samples
        val_lines = [f"other{i}.jpg\tis,the\tyes" for i in range(4)]
        val = root / "val.txt"
        val.write_text("\n".join(val_lines) + "\n")
        val_samples = VQASamples(str(val), str(root),
                                 {"<PAD>": 0, "<UNKNOWN>": 1, "is": 2, "the": 3},
                                 {"UNKNOWN": 0, "yes": 1}, 6)
        _, variables, encode = _encoder()
        fp = variables_fingerprint(variables)
        for s in (samples, val_samples):
            build_or_open(str(tmp_path), s, encode, fingerprint=fp,
                          image_size=32, dtype=jnp.float32, boundary="c",
                          batch_size=4, host_size=32, num_workers=0,
                          synthetic_images=True)
        assert len(os.listdir(tmp_path)) == 2
        # and both remain valid (reopening takes the reuse path)
        c1 = build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                           image_size=32, dtype=jnp.float32, boundary="c",
                           batch_size=4, host_size=32, num_workers=0,
                           synthetic_images=True)
        assert set(c1.row_of) == set(samples.image_names)

    def test_bf16_roundtrip_exact(self, tiny_samples, tmp_path):
        root, samples = tiny_samples
        _, variables, encode = _encoder(dtype=jnp.bfloat16)
        fp = variables_fingerprint(variables)
        cache = build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                              image_size=32, dtype=jnp.bfloat16, boundary="c",
                              batch_size=8, host_size=32, num_workers=0,
                              synthetic_images=True)
        from vqa_tpu.data.images import decode_batch
        name = samples.image_names[0]
        direct = np.asarray(encode(decode_batch(
            [samples.image_path(0)] * 8, 32, synthetic_fallback=True)))[0]
        np.testing.assert_array_equal(np.asarray(cache.rows([name])[0]),
                                      direct)


class TestModelParity:
    def test_cached_logits_match_direct(self, tiny_samples, tmp_path):
        """model(features, image_is_features=True) == model(pixels)."""
        from vqa_tpu.models import HierarchicalCoAttentionNet

        root, samples = tiny_samples
        model = HierarchicalCoAttentionNet(vocab_size=6, K=3, word_emb_dim=512,
                                           hidden_dim=512, mlp_dim=64)
        pre = make_image_preprocessor(32, jnp.float32)
        from vqa_tpu.data.images import decode_batch
        imgs = decode_batch([samples.image_path(i) for i in range(4)], 32,
                            synthetic_fallback=True)
        x = pre(imgs)
        ques = jnp.asarray(samples.questions[:4])
        lens = jnp.asarray(samples.ques_len[:4])
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, ques, lens)
        direct = model.apply(variables, x, ques, lens)

        from vqa_tpu.models.coattention import ImageCoAttentionEncoder
        enc = ImageCoAttentionEncoder(dtype=jnp.float32)
        sub = {"params": variables["params"]["image_encoder"]}
        if "batch_stats" in variables:
            sub["batch_stats"] = variables["batch_stats"]["image_encoder"]
        feats = enc.apply(sub, x, False, True)
        cached = model.apply(variables, feats, ques, lens,
                             image_is_features=True)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(cached))

    def test_baseline_cached_logits_match_direct(self, tiny_samples):
        """Baseline boundary = the conv-stack output: the FC head (and its
        dropout) stays in-step, so train-mode losses match bit-for-bit too
        (the dropout modules keep their paths => identical masks)."""
        from vqa_tpu.models import VQABaselineNet
        from vqa_tpu.models.vgg import VGG11Encoder

        root, samples = tiny_samples
        model = VQABaselineNet(vocab_size=6, K=3)
        pre = make_image_preprocessor(32, jnp.float32)
        from vqa_tpu.data.images import decode_batch
        imgs = decode_batch([samples.image_path(i) for i in range(4)], 32,
                            synthetic_fallback=True)
        x = pre(imgs)
        ques = jnp.asarray(samples.questions[:4])
        lens = jnp.asarray(samples.ques_len[:4])
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, ques, lens)
        direct = model.apply(variables, x, ques, lens)

        enc = VGG11Encoder(include_head=False)  # the cache boundary
        sub = {"params": variables["params"]["image_encoder"]["vgg11_encoder"]}
        if "batch_stats" in variables:
            sub["batch_stats"] = \
                variables["batch_stats"]["image_encoder"]["vgg11_encoder"]
        feats = enc.apply(sub, x, False, True)
        cached = model.apply(variables, feats, ques, lens,
                             image_is_features=True)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(cached))

        # train mode: dropout ACTIVE in the frozen head and the fusion MLP —
        # identical rng + identical module paths => identical logits
        rngs = {"dropout": jax.random.PRNGKey(7)}
        t_direct = model.apply(variables, x, ques, lens, train=True, rngs=rngs)
        t_cached = model.apply(variables, feats, ques, lens, train=True,
                               rngs=rngs, image_is_features=True)
        assert not np.array_equal(np.asarray(t_direct), np.asarray(direct))
        np.testing.assert_array_equal(np.asarray(t_direct),
                                      np.asarray(t_cached))


class TestLoaderIntegration:
    def test_loader_yields_feature_batches(self, tiny_samples, tmp_path):
        root, samples = tiny_samples
        _, variables, encode = _encoder()
        fp = variables_fingerprint(variables)
        cache = build_or_open(str(tmp_path), samples, encode, fingerprint=fp,
                              image_size=32, dtype=jnp.float32, boundary="c",
                              batch_size=4, host_size=32, num_workers=0,
                              synthetic_images=True)
        loader = DataLoader(samples, 4, host_size=32, shuffle=False,
                            num_workers=0, feature_cache=cache)
        batch = next(iter(loader))
        assert batch["image"].shape[0] == 4
        assert batch["image"].dtype == np.float32
        # row for sample 0 == cache row of its image
        np.testing.assert_array_equal(
            batch["image"][0], cache.rows([samples.image_names[0]])[0])


class TestCLI:
    def test_train_cli_cached(self, tmp_path):
        """--cache_features true: end-to-end train run on synthetic images."""
        from vqa_tpu.main import main
        from vqa_tpu.vocab import save_vocab

        lines = [f"img{i % 4}.jpg\tis,the,cat,black\t{'yes' if i % 2 else 'no'}"
                 for i in range(16)]
        data = tmp_path / "d.txt"
        data.write_text("\n".join(lines) + "\n")
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 2)
        main(["--mode", "train", "--model", "attention",
              "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
              "--run_name", "y", "--train_img", str(tmp_path),
              "--train_file", str(data), "--val_img", str(tmp_path),
              "--val_file", str(data), "--vocab_file", str(vocab),
              "--batch_size", "4", "--num_epochs", "1", "--num_cls", "2",
              "--log_interval", "2", "--save_interval", "100",
              "--image_size", "32", "--val_size", "8", "--opt_lvl", "0",
              "--synthetic_images", "true", "--cache_features", "true"])
        run_dir = tmp_path / "e" / "x" / "y"
        assert (run_dir / "train_log.txt").exists()
        cache_root = run_dir / "feature_cache"
        assert cache_root.exists() and len(list(cache_root.iterdir())) == 1

    def test_cached_training_on_mesh(self, tmp_path):
        """--cache_features composes with --num_devices: feature batches
        shard over the data mesh exactly like pixel batches."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs simulated multi-device CPU backend")
        from vqa_tpu.main import main
        from vqa_tpu.vocab import save_vocab

        lines = [f"img{i % 4}.jpg\tis,the,cat\t{'yes' if i % 2 else 'no'}"
                 for i in range(16)]
        data = tmp_path / "d.txt"
        data.write_text("\n".join(lines) + "\n")
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 2)
        main(["--mode", "train", "--model", "baseline",
              "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
              "--run_name", "y", "--train_img", str(tmp_path),
              "--train_file", str(data), "--vocab_file", str(vocab),
              "--batch_size", "4", "--num_epochs", "1", "--num_cls", "2",
              "--log_interval", "100", "--save_interval", "100",
              "--image_size", "32", "--opt_lvl", "0",
              "--synthetic_images", "true", "--cache_features", "true",
              "--num_devices", "2"])
        assert (tmp_path / "e" / "x" / "y" / "train_log.txt").exists()

    def test_cache_features_rejects_vgg_train(self, tmp_path):
        from vqa_tpu.main import main
        from vqa_tpu.vocab import save_vocab

        data = tmp_path / "d.txt"
        data.write_text("img0.jpg\tis,the\tyes\n" * 8)
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 2)
        with pytest.raises(SystemExit, match="frozen VGG"):
            main(["--mode", "train", "--model", "baseline",
                  "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
                  "--run_name", "y", "--train_img", str(tmp_path),
                  "--train_file", str(data), "--vocab_file", str(vocab),
                  "--batch_size", "4", "--num_epochs", "1", "--num_cls", "2",
                  "--image_size", "32", "--synthetic_images", "true",
                  "--cache_features", "true", "--vgg_train", "true"])
