"""Numerics parity vs PyTorch oracles.

The north-star requirement is logits matching the PyTorch reference to fp32
tolerance (BASELINE.json). These tests build torch oracle modules *from the
documented architecture* (SURVEY.md §2b) using public torch APIs — including
the reference's quirks (adjacent-channel phrase max-pool grouping, unused
W_b, unmasked question softmax) — convert their weights through
``vqa_tpu.models.convert``, and assert closeness of every sub-block and both
full models.

All oracles run in eval mode (BN running stats, dropout off) in fp32 on CPU.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from vqa_tpu.models import VQABaselineNet, HierarchicalCoAttentionNet
from vqa_tpu.models.convert import (baseline_from_torch, coattention_from_torch,
                                    vgg11_encoder_from_torchvision)
from vqa_tpu.models.layers import GRU, LSTM
from vqa_tpu.models.vgg import VGG11Encoder

RTOL, ATOL = 1e-4, 1e-4


def to_np(t):
    return t.detach().cpu().numpy()


def sd_np(module):
    return {k: to_np(v) for k, v in module.state_dict().items()}


def assert_close(a, b, atol=ATOL, rtol=RTOL, what=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
                               err_msg=what)


# ---------------------------------------------------------------- RNN parity

class TestGRUParity:
    def test_last_valid_hidden_matches_packed_gru(self):
        torch.manual_seed(0)
        B, L, E, H = 4, 7, 12, 16
        tg = tnn.GRU(E, H, batch_first=True)
        x = torch.randn(B, L, E)
        lens = torch.tensor([7, 5, 3, 1])
        packed = tnn.utils.rnn.pack_padded_sequence(x, lens, batch_first=True)
        _, h = tg(packed)
        h_torch = to_np(h.squeeze(0))

        sd = sd_np(tg)
        params = {"w_ih": sd["weight_ih_l0"].T, "w_hh": sd["weight_hh_l0"].T,
                  "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"]}
        h_jax = GRU(H).apply({"params": params}, jnp.asarray(to_np(x)),
                             jnp.asarray(to_np(lens)))
        assert_close(h_jax, h_torch, what="GRU last hidden")

    def test_unsorted_lengths(self):
        # torch packing requires descending sort; the scan does not
        torch.manual_seed(1)
        B, L, E, H = 3, 5, 8, 8
        tg = tnn.GRU(E, H, batch_first=True)
        x = torch.randn(B, L, E)
        lens = torch.tensor([2, 5, 4])
        order = torch.argsort(lens, descending=True)
        packed = tnn.utils.rnn.pack_padded_sequence(x[order], lens[order], batch_first=True)
        _, h = tg(packed)
        h_torch = np.empty((B, H), np.float32)
        h_torch[to_np(order)] = to_np(h.squeeze(0))

        sd = sd_np(tg)
        params = {"w_ih": sd["weight_ih_l0"].T, "w_hh": sd["weight_hh_l0"].T,
                  "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"]}
        h_jax = GRU(H).apply({"params": params}, jnp.asarray(to_np(x)),
                             jnp.asarray(to_np(lens)))
        assert_close(h_jax, h_torch, what="GRU unsorted lengths")


class TestLSTMParity:
    def test_padded_outputs_match_pack_pad(self):
        torch.manual_seed(2)
        B, L, E, H = 4, 6, 10, 12
        tl = tnn.LSTM(E, H, batch_first=True)
        x = torch.randn(B, L, E)
        lens = torch.tensor([6, 4, 2, 1])
        packed = tnn.utils.rnn.pack_padded_sequence(x, lens, batch_first=True)
        out_p, _ = tl(packed)
        out_torch = to_np(tnn.utils.rnn.pad_packed_sequence(
            out_p, batch_first=True, total_length=L)[0])

        sd = sd_np(tl)
        params = {"w_ih": sd["weight_ih_l0"].T, "w_hh": sd["weight_hh_l0"].T,
                  "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"]}
        out_jax = LSTM(H).apply({"params": params}, jnp.asarray(to_np(x)),
                                jnp.asarray(to_np(lens)))
        assert_close(out_jax, out_torch, what="LSTM padded outputs")
        # zero beyond length, exactly
        assert np.abs(np.asarray(out_jax)[1, 4:]).max() == 0.0


# ---------------------------------------------------------------- VGG parity

def build_torch_vgg11_bn():
    """torchvision-key-compatible VGG-11-bn built from public torch layers."""
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    feats, in_c = [], 3
    for v in cfg:
        if v == "M":
            feats.append(tnn.MaxPool2d(2, 2))
        else:
            feats += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.BatchNorm2d(v),
                      tnn.ReLU(inplace=True)]
            in_c = v
    m = tnn.Module()
    m.features = tnn.Sequential(*feats)
    m.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
    m.classifier = tnn.Sequential(
        tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 1000))
    return m


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so eval-mode parity is real."""
    g = torch.Generator().manual_seed(seed)
    for mod in module.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            mod.running_mean = torch.randn(mod.num_features, generator=g) * 0.1
            mod.running_var = torch.rand(mod.num_features, generator=g) + 0.5


class TestVGGParity:
    def test_features_and_head(self):
        torch.manual_seed(3)
        tv = build_torch_vgg11_bn()
        randomize_bn_stats(tv)
        tv.eval()
        x = torch.randn(1, 3, 224, 224)
        with torch.no_grad():
            f = tv.features(x)
            pooled = tv.avgpool(f)
            head = tnn.Sequential(tnn.Flatten(), *list(tv.classifier)[:-1])(pooled)

        params, stats = vgg11_encoder_from_torchvision(sd_np(tv), include_head=True)
        enc = VGG11Encoder(include_head=True)
        x_jax = jnp.asarray(to_np(x).transpose(0, 2, 3, 1))  # NCHW -> NHWC
        out = enc.apply({"params": params, "batch_stats": stats}, x_jax,
                        train=False, use_running_stats=True)
        # deep conv stack: loosen atol, check relative scale
        assert_close(out, to_np(head), atol=5e-3, rtol=1e-3, what="VGG 4096-d head")

        feat_only = VGG11Encoder(include_head=False).apply(
            {"params": {"features": params["features"]},
             "batch_stats": {"features": stats["features"]}},
            x_jax, train=False, use_running_stats=True)
        f_torch = to_np(f).transpose(0, 2, 3, 1)
        assert_close(feat_only, f_torch, atol=2e-3, rtol=1e-3, what="VGG feature map")


# ------------------------------------------------------- full-model oracles

def build_torch_baseline(vocab_size, K):
    """Reference-key-compatible baseline oracle (SURVEY.md M1-M3)."""
    vgg = build_torch_vgg11_bn()
    img_enc = tnn.Module()
    img_enc.vgg11_encoder = tnn.Sequential(OrderedDict([
        ("conv_layers", vgg.features),
        ("avgpool", vgg.avgpool),
        ("fc_layers", tnn.Sequential(tnn.Flatten(), *list(vgg.classifier)[:-1])),
    ]))
    img_enc.embedding_layer = tnn.Sequential(tnn.Linear(4096, 1024), tnn.Tanh())

    q_enc = tnn.Module()
    q_enc.word_embedding = tnn.Sequential(tnn.Embedding(vocab_size, 300), tnn.Tanh())
    q_enc.gru = tnn.GRU(300, 1024)
    q_enc.embedding_layer = tnn.Sequential(tnn.Linear(1024, 1024), tnn.Tanh())

    model = tnn.Module()
    model.image_encoder = img_enc
    model.question_encoder = q_enc
    model.mlp = tnn.Sequential(tnn.Linear(1024, 1000), tnn.Dropout(0.5), tnn.Tanh())
    model.fc_final = tnn.Linear(1000, K)

    def forward(img, ques, lens):
        x = img_enc.vgg11_encoder(img)
        x = tF.normalize(x, dim=1, p=2)
        img_emb = img_enc.embedding_layer(x)
        w = q_enc.word_embedding(ques)
        packed = tnn.utils.rnn.pack_padded_sequence(w, lens, batch_first=True)
        _, h = q_enc.gru(packed)
        q_emb = q_enc.embedding_layer(h.squeeze(0))
        return model.fc_final(model.mlp(img_emb * q_emb))

    return model, forward


def build_torch_coattention(vocab_size, K, E=512, H=512, mlp_dim=1024):
    """Reference-key-compatible HieCoAttn oracle (SURVEY.md M4-M9)."""
    vgg = build_torch_vgg11_bn()
    img_enc = tnn.Module()
    img_enc.vgg11_encoder = vgg.features

    q_enc = tnn.Module()
    q_enc.word_embedding = tnn.Embedding(vocab_size, E, padding_idx=0)
    pcp = tnn.Module()
    pcp.conv_unigram = tnn.Sequential(tnn.ConstantPad1d((0, 0), 0),
                                      tnn.Conv1d(E, E, 1, 1), tnn.Tanh())
    pcp.conv_bigram = tnn.Sequential(tnn.ConstantPad1d((1, 0), 0),
                                     tnn.Conv1d(E, E, 2, 1), tnn.Tanh())
    pcp.conv_trigram = tnn.Sequential(tnn.ConstantPad1d((1, 1), 0),
                                      tnn.Conv1d(E, E, 3, 1), tnn.Tanh())
    q_enc.phrase_conv_pool = pcp
    q_enc.sentence_lstm = tnn.LSTM(E, H)

    co = tnn.Module()
    co.W_b = tnn.Linear(H, H)  # created but unused (reference quirk)
    co.W_v = tnn.Linear(H, H)
    co.W_q = tnn.Linear(H, H)
    co.w_v = tnn.Linear(H, 1)
    co.w_q = tnn.Linear(H, 1)

    mlp = tnn.Module()
    mlp.W_w = tnn.Linear(H, H)
    mlp.W_p = tnn.Linear(2 * H, H)
    mlp.W_s = tnn.Linear(2 * H, mlp_dim)
    mlp.W_h = tnn.Linear(mlp_dim, K)

    model = tnn.Module()
    model.image_encoder = img_enc
    model.question_encoder = q_enc
    model.co_attention = co
    model.mlp_classify = mlp

    def phrase_pool(w_emb):
        B, L, _ = w_emb.shape
        xc = w_emb.permute(0, 2, 1)
        cat = torch.cat([pcp.conv_unigram(xc), pcp.conv_bigram(xc),
                         pcp.conv_trigram(xc)], dim=1)
        # the quirky regroup: [B,3E,L] -> [B,L,3E] -> [B,L,E,3] -> max
        cat = cat.permute(0, 2, 1).reshape(B, L, E, 3)
        return cat.max(dim=3).values

    def forward(img, ques, lens):
        L = ques.shape[1]
        w_emb = q_enc.word_embedding(ques)
        p_emb = phrase_pool(w_emb)
        packed = tnn.utils.rnn.pack_padded_sequence(p_emb, lens, batch_first=True)
        s_packed, _ = q_enc.sentence_lstm(packed)
        p_pad = tnn.utils.rnn.pad_packed_sequence(packed, batch_first=True,
                                                  total_length=L)[0]
        s_pad = tnn.utils.rnn.pad_packed_sequence(s_packed, batch_first=True,
                                                  total_length=L)[0]

        fmap = img_enc.vgg11_encoder(img)            # [B,512,h,w]
        V = fmap.flatten(2).permute(0, 2, 1)         # [B,S,512]

        img_feats, ques_feats = [], []
        for Q in (w_emb, p_pad, s_pad):
            C = torch.tanh(torch.bmm(Q, V.permute(0, 2, 1)))
            H_v = torch.tanh(co.W_v(V) + torch.bmm(C.transpose(2, 1), co.W_q(Q)))
            H_q = torch.tanh(co.W_q(Q) + torch.bmm(C, co.W_v(V)))
            a_v = tF.softmax(co.w_v(H_v), dim=1)
            a_q = tF.softmax(co.w_q(H_q), dim=1)
            img_feats.append((a_v * V).sum(dim=1))
            ques_feats.append((a_q * Q).sum(dim=1))

        q_w, q_p, q_s = ques_feats
        v_w, v_p, v_s = img_feats
        h_w = torch.tanh(mlp.W_w(q_w + v_w))
        h_p = torch.tanh(mlp.W_p(torch.cat([q_p + v_p, h_w], dim=1)))
        h_s = torch.tanh(mlp.W_s(torch.cat([q_s + v_s, h_p], dim=1)))
        return mlp.W_h(h_s)

    return model, forward


class TestFullModelParity:
    def test_baseline_logits(self):
        torch.manual_seed(4)
        V, K, B, L = 30, 5, 2, 6
        model, fwd = build_torch_baseline(V, K)
        randomize_bn_stats(model)
        model.eval()
        img = torch.randn(B, 3, 224, 224)
        ques = torch.randint(1, V, (B, L))
        lens = torch.tensor([6, 3])
        ques[1, 3:] = 0
        with torch.no_grad():
            logits_torch = to_np(fwd(img, ques, lens))

        params, stats = baseline_from_torch(sd_np(model))
        net = VQABaselineNet(vocab_size=V, K=K)
        logits = net.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(to_np(img).transpose(0, 2, 3, 1)),
                           jnp.asarray(to_np(ques)), jnp.asarray(to_np(lens)),
                           train=False, use_running_stats=True)
        assert_close(logits, logits_torch, atol=5e-3, rtol=1e-3,
                     what="baseline logits")

    def test_coattention_logits(self):
        torch.manual_seed(5)
        V, K, B, L = 30, 5, 2, 6
        model, fwd = build_torch_coattention(V, K)
        randomize_bn_stats(model)
        model.eval()
        # small image -> small spatial map; co-attention is size-agnostic
        img = torch.randn(B, 3, 64, 64)
        ques = torch.randint(1, V, (B, L))
        lens = torch.tensor([6, 4])
        ques[1, 4:] = 0
        with torch.no_grad():
            logits_torch = to_np(fwd(img, ques, lens))

        params, stats = coattention_from_torch(sd_np(model))
        net = HierarchicalCoAttentionNet(vocab_size=V, K=K)
        logits = net.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(to_np(img).transpose(0, 2, 3, 1)),
                           jnp.asarray(to_np(ques)), jnp.asarray(to_np(lens)),
                           train=False, use_running_stats=True)
        assert_close(logits, logits_torch, atol=5e-3, rtol=1e-3,
                     what="coattention logits")


class TestSpaceToDepthFirstStage:
    """s2d_first rewrites conv0+pool as a phase conv — must be numerics-exact."""

    def test_matches_standard_path(self):
        import jax
        import jax.numpy as jnp
        from vqa_tpu.models.vgg import VGGFeatures

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
        m_std = VGGFeatures(s2d_first=False)
        m_s2d = VGGFeatures(s2d_first=True)
        vs = m_std.init(jax.random.PRNGKey(1), x)
        a = m_std.apply(vs, x)
        b = m_s2d.apply(vs, x)  # identical param tree
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_odd_size_falls_back(self):
        import jax
        import jax.numpy as jnp
        from vqa_tpu.models.vgg import VGGFeatures

        # odd spatial size cannot space-to-depth; the module must fall back
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 33, 33, 3), jnp.float32)
        m = VGGFeatures(s2d_first=True)
        vs = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(vs, x)
        assert out.shape[-1] == 512


class TestExportRoundTrip:
    """flax -> .pth-format state_dict -> flax must round-trip exactly, and the
    exported dict must load into the torch oracle with identical logits."""

    @pytest.mark.slow
    def test_baseline_roundtrip_and_torch_load(self):
        from vqa_tpu.models.convert import baseline_from_torch, to_torch

        torch.manual_seed(7)
        V, K = 25, 4
        net = VQABaselineNet(vocab_size=V, K=K)
        img = jnp.zeros((1, 224, 224, 3))
        ques = jnp.ones((1, 5), jnp.int32)
        lens = jnp.array([5], jnp.int32)
        vs = jax.jit(net.init)({"params": jax.random.PRNGKey(0)}, img, ques, lens)

        sd = to_torch("baseline", vs["params"], vs["batch_stats"])
        p2, s2 = baseline_from_torch(sd)
        for a, b in zip(jax.tree_util.tree_leaves(vs["params"]),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # strict load into the reference-shaped torch oracle
        model, fwd = build_torch_baseline(V, K)
        model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}, strict=True)
        model.eval()
        t_img = torch.randn(2, 3, 224, 224)
        t_ques = torch.randint(1, V, (2, 6))
        t_lens = torch.tensor([6, 4])
        with torch.no_grad():
            ref = to_np(fwd(t_img, t_ques, t_lens))
        out = net.apply(vs, jnp.asarray(to_np(t_img).transpose(0, 2, 3, 1)),
                        jnp.asarray(to_np(t_ques)), jnp.asarray(to_np(t_lens)))
        assert_close(out, ref, atol=5e-3, rtol=1e-3, what="export round-trip logits")

    def test_coattention_roundtrip(self):
        from vqa_tpu.models.convert import coattention_from_torch, to_torch

        V, K = 25, 4
        net = HierarchicalCoAttentionNet(vocab_size=V, K=K)
        img = jnp.zeros((1, 64, 64, 3))
        ques = jnp.ones((1, 5), jnp.int32)
        lens = jnp.array([5], jnp.int32)
        vs = jax.jit(net.init)({"params": jax.random.PRNGKey(1)}, img, ques, lens)

        sd = to_torch("attention", vs["params"], vs["batch_stats"])
        assert "co_attention.W_b.weight" in sd  # re-synthesized for load compat
        p2, _ = coattention_from_torch(sd)
        import flax.traverse_util as tu
        flat_a = tu.flatten_dict(vs["params"])
        flat_b = tu.flatten_dict(p2)
        emb_key = ("question_encoder", "word_embedding", "embedding")
        for k in flat_a:
            a, b = np.asarray(flat_a[k]), np.asarray(flat_b[k])
            if k == emb_key:
                # export zeroes the pad row (masked at lookup in flax, but
                # torch padding_idx does not mask at forward); all other rows
                # round-trip exactly
                assert np.abs(b[0]).max() == 0.0
                np.testing.assert_array_equal(a[1:], b[1:])
            else:
                np.testing.assert_array_equal(a, b, err_msg=str(k))


class TestPadRowExport:
    def test_coattention_export_zeroes_pad_embedding_row(self):
        """torch padding_idx=0 does NOT mask at forward; the exported row 0
        must be zero or padded positions leak features into the unmasked
        question softmax."""
        from vqa_tpu.models.convert import to_torch

        net = HierarchicalCoAttentionNet(vocab_size=12, K=3)
        img = jnp.zeros((1, 64, 64, 3))
        ques = jnp.ones((1, 4), jnp.int32)
        lens = jnp.array([4], jnp.int32)
        vs = jax.jit(net.init)({"params": jax.random.PRNGKey(0)}, img, ques, lens)
        # the stored flax row 0 is random (masked at lookup, never trained)
        assert np.abs(np.asarray(
            vs["params"]["question_encoder"]["word_embedding"]["embedding"][0])
        ).max() > 0
        sd = to_torch("attention", vs["params"], vs["batch_stats"])
        assert np.abs(sd["question_encoder.word_embedding.weight"][0]).max() == 0.0
