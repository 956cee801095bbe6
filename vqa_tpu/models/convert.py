"""PyTorch ``.pth`` <-> flax pytree weight converters.

Maps reference checkpoints (state_dict naming from /root/reference/model.py)
and torchvision ``vgg11_bn`` weight files onto this framework's parameter
trees, handling the layout changes of the TPU-native design:

- Linear: torch ``weight [out, in]`` -> kernel ``[in, out]`` (transpose);
- Conv2d: OIHW -> HWIO; Conv1d: [out, in, k] -> [k, in, out];
- GRU/LSTM: ``weight_ih_l0 [G*H, E]`` -> ``w_ih [E, G*H]`` (gate column order
  preserved: GRU (r,z,n), LSTM (i,f,g,o));
- the first VGG classifier Linear's 25088-dim input axis is permuted from
  CHW to HWC flatten order;
- BatchNorm weight/bias -> params scale/bias; running_mean/var ->
  batch_stats mean/var (num_batches_tracked dropped);
- the co-attention ``W_b`` (created but unused in the reference forward,
  model.py:347,377) is dropped on import.

Inputs are mappings ``name -> numpy array`` — use :func:`load_torch_state_dict`
to read a ``.pth`` via torch (CPU) and detach to numpy.
"""

from __future__ import annotations

import numpy as np

# torchvision vgg11_bn features-Sequential indices of the 8 convs; BN is i+1
VGG11_TORCH_CONV_IDX = (0, 4, 8, 11, 15, 18, 22, 25)


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth file into a {name: np.ndarray} dict (requires torch, CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _linear(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
            "bias": sd[f"{key}.bias"].copy()}


def _conv2d(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{key}.bias"].copy()}


def _bn(sd, key):
    params = {"scale": sd[f"{key}.weight"].copy(), "bias": sd[f"{key}.bias"].copy()}
    stats = {"mean": sd[f"{key}.running_mean"].copy(),
             "var": sd[f"{key}.running_var"].copy()}
    return params, stats


def _rnn(sd, key):
    return {"w_ih": np.ascontiguousarray(sd[f"{key}.weight_ih_l0"].T),
            "w_hh": np.ascontiguousarray(sd[f"{key}.weight_hh_l0"].T),
            "b_ih": sd[f"{key}.bias_ih_l0"].copy(),
            "b_hh": sd[f"{key}.bias_hh_l0"].copy()}


def _conv1d(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 1, 0)),
            "bias": sd[f"{key}.bias"].copy()}


def _vgg_head_fc0(sd, key):
    """First classifier Linear: permute the flattened input axis CHW -> HWC."""
    w = sd[f"{key}.weight"]                         # [4096, 512*7*7] in CHW order
    w = w.reshape(w.shape[0], 512, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    return {"kernel": np.ascontiguousarray(w.T), "bias": sd[f"{key}.bias"].copy()}


def vgg_features_from_torch(sd, prefix: str):
    """torch ``<prefix>.{i}`` conv/BN stack -> VGGFeatures params + batch_stats."""
    params, stats = {}, {}
    for n, i in enumerate(VGG11_TORCH_CONV_IDX):
        params[f"conv{n}"] = _conv2d(sd, f"{prefix}.{i}")
        bn_p, bn_s = _bn(sd, f"{prefix}.{i + 1}")
        params[f"bn{n}"] = bn_p
        stats[f"bn{n}"] = bn_s
    return params, stats


def vgg11_encoder_from_torchvision(sd, include_head: bool = True):
    """torchvision ``vgg11_bn`` state_dict -> VGG11Encoder (params, batch_stats).

    Used for ``--vgg_wts_path`` pretrained weights (reference model.py:86-90).
    """
    feat_p, feat_s = vgg_features_from_torch(sd, "features")
    params = {"features": feat_p}
    stats = {"features": feat_s}
    if include_head:
        params["classifier"] = {"fc0": _vgg_head_fc0(sd, "classifier.0"),
                                "fc1": _linear(sd, "classifier.3")}
    return params, stats


def baseline_from_torch(sd):
    """Reference ``VQABaselineNet.state_dict()`` -> (params, batch_stats)."""
    feat_p, feat_s = vgg_features_from_torch(sd, "image_encoder.vgg11_encoder.conv_layers")
    params = {
        "image_encoder": {
            "vgg11_encoder": {
                "features": feat_p,
                "classifier": {
                    # fc_layers = Sequential(Flatten, Linear, ReLU, Dropout,
                    # Linear, ReLU, Dropout) -> Linears at indices 1 and 4
                    "fc0": _vgg_head_fc0(sd, "image_encoder.vgg11_encoder.fc_layers.1"),
                    "fc1": _linear(sd, "image_encoder.vgg11_encoder.fc_layers.4"),
                },
            },
            "embedding_fc": _linear(sd, "image_encoder.embedding_layer.0"),
        },
        "question_encoder": {
            "word_embedding": {
                "embedding": sd["question_encoder.word_embedding.0.weight"].copy()},
            "gru": _rnn(sd, "question_encoder.gru"),
            "embedding_fc": _linear(sd, "question_encoder.embedding_layer.0"),
        },
        "mlp_fc": _linear(sd, "mlp.0"),
        "fc_final": _linear(sd, "fc_final"),
    }
    batch_stats = {"image_encoder": {"vgg11_encoder": {"features": feat_s}}}
    return params, batch_stats


def coattention_from_torch(sd):
    """Reference ``HierarchicalCoAttentionNet.state_dict()`` -> (params, batch_stats)."""
    feat_p, feat_s = vgg_features_from_torch(sd, "image_encoder.vgg11_encoder")
    pcp = {}
    for gram in ("unigram", "bigram", "trigram"):
        # Sequential(ConstantPad1d, Conv1d, Tanh) -> conv at index 1
        c = _conv1d(sd, f"question_encoder.phrase_conv_pool.conv_{gram}.1")
        pcp[f"conv_{gram}_kernel"] = c["kernel"]
        pcp[f"conv_{gram}_bias"] = c["bias"]

    co = {}
    for name in ("W_v", "W_q", "w_v", "w_q"):  # W_b intentionally dropped
        lin = _linear(sd, f"co_attention.{name}")
        co[f"{name}_kernel"] = lin["kernel"]
        co[f"{name}_bias"] = lin["bias"]

    params = {
        "image_encoder": {"vgg11_encoder": {"features": feat_p}},
        "question_encoder": {
            "word_embedding": {
                "embedding": sd["question_encoder.word_embedding.weight"].copy()},
            "phrase_conv_pool": pcp,
            "sentence_lstm": _rnn(sd, "question_encoder.sentence_lstm"),
        },
        "co_attention": co,
        "mlp_classify": {w: _linear(sd, f"mlp_classify.{w}")
                         for w in ("W_w", "W_p", "W_s", "W_h")},
    }
    batch_stats = {"image_encoder": {"vgg11_encoder": {"features": feat_s}}}
    return params, batch_stats


def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def bert_to_torch(params, batch_stats) -> dict:
    """VQABertNet pytree -> flat torch-style state_dict.

    The reference declares ``--model bert`` but never implements it
    (/root/reference/main.py:41, README.md:137), so there is no reference
    naming to match; keys are the flax parameter paths joined with '.',
    prefixed ``params.`` / ``batch_stats.`` (the VGG image tower's BN stats
    live under the latter). Arrays keep flax layouts — this format exists
    for round-tripping bert checkpoints through .pth files, not for loading
    into a torch module.
    """
    sd = _flatten_tree(params, "params")
    sd.update(_flatten_tree(batch_stats, "batch_stats"))
    return sd


def bert_from_torch(sd):
    """Inverse of :func:`bert_to_torch` -> (params, batch_stats)."""
    params_flat = {k[len("params."):]: v for k, v in sd.items()
                   if k.startswith("params.")}
    stats_flat = {k[len("batch_stats."):]: v for k, v in sd.items()
                  if k.startswith("batch_stats.")}
    if not params_flat:
        raise ValueError(
            "not a vqa_tpu bert .pth: no 'params.*' keys found (bert has no "
            "reference torch format; only files written by save_pth/"
            "bert_to_torch load)")
    return _unflatten_tree(params_flat), _unflatten_tree(stats_flat)


def from_torch(model_name: str, sd):
    """Dispatch by model name ('baseline' | 'attention' | 'bert')."""
    if model_name == "baseline":
        return baseline_from_torch(sd)
    if model_name == "attention":
        return coattention_from_torch(sd)
    if model_name == "bert":
        return bert_from_torch(sd)
    raise ValueError(f"unknown model {model_name!r}")


# --------------------------------------------------------------------------
# Export: flax pytree -> reference-format torch state_dict (for parity tests
# and for users migrating checkpoints back; SURVEY.md §5.4).

def _linear_out(tree):
    return {"weight": np.ascontiguousarray(np.asarray(tree["kernel"]).T),
            "bias": np.asarray(tree["bias"]).copy()}


def _conv2d_out(tree):
    return {"weight": np.ascontiguousarray(
                np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)),
            "bias": np.asarray(tree["bias"]).copy()}


def _bn_out(params, stats):
    return {"weight": np.asarray(params["scale"]).copy(),
            "bias": np.asarray(params["bias"]).copy(),
            "running_mean": np.asarray(stats["mean"]).copy(),
            "running_var": np.asarray(stats["var"]).copy(),
            "num_batches_tracked": np.asarray(0, dtype=np.int64)}


def _rnn_out(tree):
    return {"weight_ih_l0": np.ascontiguousarray(np.asarray(tree["w_ih"]).T),
            "weight_hh_l0": np.ascontiguousarray(np.asarray(tree["w_hh"]).T),
            "bias_ih_l0": np.asarray(tree["b_ih"]).copy(),
            "bias_hh_l0": np.asarray(tree["b_hh"]).copy()}


def _conv1d_out(kernel, bias):
    return {"weight": np.ascontiguousarray(np.asarray(kernel).transpose(2, 1, 0)),
            "bias": np.asarray(bias).copy()}


def _vgg_head_fc0_out(tree):
    w = np.asarray(tree["kernel"]).T                   # [4096, 25088] HWC order
    w = w.reshape(w.shape[0], 7, 7, 512).transpose(0, 3, 1, 2).reshape(w.shape[0], -1)
    return {"weight": np.ascontiguousarray(w), "bias": np.asarray(tree["bias"]).copy()}


def _flatten_into(sd, prefix, tree):
    for name, value in tree.items():
        sd[f"{prefix}.{name}"] = value


def vgg_features_to_torch(params, stats, prefix: str) -> dict:
    sd: dict = {}
    for n, i in enumerate(VGG11_TORCH_CONV_IDX):
        _flatten_into(sd, f"{prefix}.{i}", _conv2d_out(params[f"conv{n}"]))
        _flatten_into(sd, f"{prefix}.{i + 1}", _bn_out(params[f"bn{n}"], stats[f"bn{n}"]))
    return sd


def baseline_to_torch(params, batch_stats) -> dict:
    """VQABaselineNet pytree -> reference-naming state_dict (numpy values)."""
    img = params["image_encoder"]
    q = params["question_encoder"]
    vgg_stats = batch_stats["image_encoder"]["vgg11_encoder"]["features"]
    sd = vgg_features_to_torch(img["vgg11_encoder"]["features"], vgg_stats,
                               "image_encoder.vgg11_encoder.conv_layers")
    _flatten_into(sd, "image_encoder.vgg11_encoder.fc_layers.1",
                  _vgg_head_fc0_out(img["vgg11_encoder"]["classifier"]["fc0"]))
    _flatten_into(sd, "image_encoder.vgg11_encoder.fc_layers.4",
                  _linear_out(img["vgg11_encoder"]["classifier"]["fc1"]))
    _flatten_into(sd, "image_encoder.embedding_layer.0", _linear_out(img["embedding_fc"]))
    sd["question_encoder.word_embedding.0.weight"] = \
        np.asarray(q["word_embedding"]["embedding"]).copy()
    _flatten_into(sd, "question_encoder.gru", _rnn_out(q["gru"]))
    _flatten_into(sd, "question_encoder.embedding_layer.0", _linear_out(q["embedding_fc"]))
    _flatten_into(sd, "mlp.0", _linear_out(params["mlp_fc"]))
    _flatten_into(sd, "fc_final", _linear_out(params["fc_final"]))
    return sd


def coattention_to_torch(params, batch_stats) -> dict:
    """HierarchicalCoAttentionNet pytree -> reference-naming state_dict.

    ``co_attention.W_b`` (which the reference creates but never uses in
    forward, model.py:347,377) is re-synthesized as zeros so the exported
    dict is load_state_dict-complete against the reference module.
    """
    q = params["question_encoder"]
    vgg_stats = batch_stats["image_encoder"]["vgg11_encoder"]["features"]
    sd = vgg_features_to_torch(params["image_encoder"]["vgg11_encoder"]["features"],
                               vgg_stats, "image_encoder.vgg11_encoder")
    emb = np.asarray(q["word_embedding"]["embedding"]).copy()
    # the flax Embedding masks row 0 at lookup (padding_idx semantics), so the
    # stored row keeps its random init; torch nn.Embedding(padding_idx=0) does
    # NOT mask at forward — zero the row on export or padded positions leak
    # nonzero features into the (deliberately unmasked) question softmax
    emb[0] = 0.0
    sd["question_encoder.word_embedding.weight"] = emb
    pcp = q["phrase_conv_pool"]
    for gram in ("unigram", "bigram", "trigram"):
        _flatten_into(sd, f"question_encoder.phrase_conv_pool.conv_{gram}.1",
                      _conv1d_out(pcp[f"conv_{gram}_kernel"], pcp[f"conv_{gram}_bias"]))
    _flatten_into(sd, "question_encoder.sentence_lstm", _rnn_out(q["sentence_lstm"]))
    co = params["co_attention"]
    d = np.asarray(co["W_v_kernel"]).shape[0]
    sd["co_attention.W_b.weight"] = np.zeros((d, d), np.float32)
    sd["co_attention.W_b.bias"] = np.zeros((d,), np.float32)
    for name in ("W_v", "W_q", "w_v", "w_q"):
        _flatten_into(sd, f"co_attention.{name}",
                      _linear_out({"kernel": co[f"{name}_kernel"],
                                   "bias": co[f"{name}_bias"]}))
    for w in ("W_w", "W_p", "W_s", "W_h"):
        _flatten_into(sd, f"mlp_classify.{w}", _linear_out(params["mlp_classify"][w]))
    return sd


def to_torch(model_name: str, params, batch_stats) -> dict:
    """Dispatch by model name; values are numpy (wrap with torch.from_numpy
    + torch.save for a .pth file)."""
    params = {k: v for k, v in params.items()}
    if model_name == "baseline":
        return baseline_to_torch(params, batch_stats)
    if model_name == "attention":
        return coattention_to_torch(params, batch_stats)
    if model_name == "bert":
        return bert_to_torch(params, batch_stats)
    raise ValueError(f"unknown model {model_name!r}")


def save_pth(path: str, model_name: str, params, batch_stats) -> None:
    """Write a reference-format .pth checkpoint (requires torch)."""
    import torch

    sd = to_torch(model_name, params, batch_stats)
    # np.array (not asarray): owned writable buffers — torch.from_numpy on a
    # read-only JAX export view warns about undefined mutation behavior
    torch.save({k: torch.from_numpy(np.array(
        v, dtype=None if np.asarray(v).dtype == np.int64 else np.float32))
        for k, v in sd.items()}, path)
