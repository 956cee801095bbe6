"""Export a trained VGG backbone to a torchvision ``vgg11_bn`` .pth.

Takes a vqa_tpu baseline checkpoint (e.g. trained with ``--vgg_train
true``) and writes a state_dict with torchvision's exact key set, loadable
by BOTH frameworks via ``--vgg_wts_path`` (the reference strict-loads it
into ``models.vgg11_bn()``, /root/reference/model.py:86-90).

Purpose: the accuracy drift benchmark needs a *pretrained* backbone — a
frozen random VGG caps the grid task at ~43% (BASELINE.md r3) — and no
torchvision download exists here, so the backbone is pretrained on the
synthetic task itself and shared through the reference's own weights-file
contract.

Usage:
  python tools/export_vgg_pth.py --ckpt <run>/model_N.ckpt \
      --out /tmp/gridvqa2/vgg11_bn_pretrained.pth [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="baseline model .ckpt")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--seed", type=int, default=0,
                    help="seed for the (unused) final FC-1000 torchvision "
                         "layer the reference's strict load requires")
    args = ap.parse_args()

    import torch

    from vqa_tpu.models.convert import (_linear_out, _vgg_head_fc0_out,
                                        vgg_features_to_torch)
    from vqa_tpu.train.checkpoint import load_params_only

    params, stats = load_params_only(args.ckpt, "baseline")
    vgg_p = params["image_encoder"]["vgg11_encoder"]
    vgg_s = stats["image_encoder"]["vgg11_encoder"]["features"]

    sd = vgg_features_to_torch(vgg_p["features"], vgg_s, "features")

    def put(prefix, d):
        for k, v in d.items():
            sd[f"{prefix}.{k}"] = v

    put("classifier.0", _vgg_head_fc0_out(vgg_p["classifier"]["fc0"]))
    put("classifier.3", _linear_out(vgg_p["classifier"]["fc1"]))
    # torchvision's final FC-1000: required by the strict load, dropped by
    # both frameworks (reference model.py:93); torch-init for determinism
    torch.manual_seed(args.seed)
    fc6 = torch.nn.Linear(4096, 1000)
    torch.nn.init.normal_(fc6.weight, 0, 0.01)
    torch.nn.init.constant_(fc6.bias, 0)
    sd["classifier.6.weight"] = fc6.weight.detach().numpy()
    sd["classifier.6.bias"] = fc6.bias.detach().numpy()

    tensors = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    # validate against the real torchvision keyset contract
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_synth_dataset import make_vgg11_bn_state_dict
    expect = set(make_vgg11_bn_state_dict(0).keys())
    assert set(tensors) == expect, (
        f"keyset mismatch: missing {expect - set(tensors)}, "
        f"extra {set(tensors) - expect}")
    torch.save(tensors, args.out)
    print(f"wrote {args.out} ({len(tensors)} tensors)")


if __name__ == "__main__":
    main()
