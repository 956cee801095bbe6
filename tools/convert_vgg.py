#!/usr/bin/env python
"""Convert a torchvision ``vgg11_bn`` .pth into a framework-native npz.

Usage:
    python tools/convert_vgg.py vgg11_bn-6002323d.pth vgg11_bn.npz [--no-head]

The training CLI consumes the original ``.pth`` directly via
``--vgg_wts_path`` (it converts on load); this tool exists for offline
conversion/inspection and to strip torch from deployment images.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from vqa_tpu.models.convert import (load_torch_state_dict,
                                    vgg11_encoder_from_torchvision)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="torchvision vgg11_bn .pth file")
    ap.add_argument("dst", help="output .npz")
    ap.add_argument("--no-head", action="store_true",
                    help="features only (co-attention encoder layout)")
    args = ap.parse_args(argv)

    sd = load_torch_state_dict(args.src)
    params, stats = vgg11_encoder_from_torchvision(sd, include_head=not args.no_head)

    import flax.traverse_util as tu
    flat = {"params/" + "/".join(k): v for k, v in tu.flatten_dict(params).items()}
    flat.update({"batch_stats/" + "/".join(k): v
                 for k, v in tu.flatten_dict(stats).items()})
    np.savez(args.dst, **flat)
    print(f"wrote {len(flat)} arrays to {args.dst}")


if __name__ == "__main__":
    main()
