"""Deterministic synthetic VQA dataset for cross-framework accuracy parity.

Generates real JPEG files on disk plus reference-contract dataset artifacts
(BASELINE.json config 1: 10k-pair K=2 slice) so the torch reference and
vqa_tpu train on the *same* files end-to-end:

- imgs/synth_<i>.jpg: textured two-tone images; the answer is "yes" iff the
  mean red channel exceeds the mean blue channel (image-determined labels,
  so accuracy exercises the vision path, not question priors);
- train.txt / val.txt in the reference's `img \t q,tokens \t ans` format,
  questions drawn from answer-independent templates;
- vocab.pkl via vqa_tpu.vocab.save_vocab (reference pickle contract);
- vgg11_bn_synth.pth: a random-init state_dict with torchvision
  ``vgg11_bn``'s exact key set, loadable by BOTH frameworks via
  --vgg_wts_path (no pretrained download exists in this environment).

Usage: python tools/make_synth_dataset.py --out_dir /tmp/synthvqa
"""

from __future__ import annotations

import argparse
import os

import numpy as np

TEMPLATES = [
    "is,the,image,more,red,than,blue",
    "does,red,dominate,over,blue,here",
    "is,this,picture,warmer,than,it,is,cold",
    "would,you,say,red,beats,blue,in,this,image",
    "is,the,red,channel,stronger,than,the,blue,one",
    "looking,at,the,colors,is,red,the,winner",
    "tell,me,if,red,is,brighter,than,blue",
    "compared,to,blue,is,red,more,present",
]


def make_image(rng: np.random.Generator, size: int) -> tuple[np.ndarray, str]:
    """Textured two-tone image; answer = 'yes' iff mean(R) > mean(B)."""
    r_level = rng.uniform(40, 215)
    b_level = rng.uniform(40, 215)
    while abs(r_level - b_level) < 25:  # keep labels robust to JPEG loss
        b_level = rng.uniform(40, 215)
    img = np.zeros((size, size, 3), np.float32)
    img[..., 0] = r_level
    img[..., 2] = b_level
    img[..., 1] = rng.uniform(40, 215)
    # low-frequency texture + noise so JPEG content is non-degenerate
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for c in range(3):
        img[..., c] += 30 * np.sin(2 * np.pi * (rng.uniform(1, 4) * xx
                                                + rng.uniform(1, 4) * yy))
    img += rng.normal(0, 12, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    answer = "yes" if img[..., 0].mean() > img[..., 2].mean() else "no"
    return img, answer


def write_split(path, pairs):
    with open(path, "w") as f:
        for name, q, a in pairs:
            f.write(f"{name}\t{q}\t{a}\n")


def make_vgg11_bn_state_dict(seed: int = 0):
    """Random-init state_dict with torchvision ``vgg11_bn``'s exact keys."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    feats, in_c = [], 3
    for v in cfg:
        if v == "M":
            feats.append(nn.MaxPool2d(2, 2))
        else:
            feats += [nn.Conv2d(in_c, v, 3, padding=1), nn.BatchNorm2d(v),
                      nn.ReLU(inplace=True)]
            in_c = v
    m = nn.Module()
    m.features = nn.Sequential(*feats)
    m.avgpool = nn.AdaptiveAvgPool2d((7, 7))
    m.classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 1000))
    # torchvision _initialize_weights: kaiming convs, N(0,0.01) linears
    for mod in m.modules():
        if isinstance(mod, nn.Conv2d):
            nn.init.kaiming_normal_(mod.weight, mode="fan_out",
                                    nonlinearity="relu")
            nn.init.constant_(mod.bias, 0)
        elif isinstance(mod, nn.BatchNorm2d):
            nn.init.constant_(mod.weight, 1)
            nn.init.constant_(mod.bias, 0)
        elif isinstance(mod, nn.Linear):
            nn.init.normal_(mod.weight, 0, 0.01)
            nn.init.constant_(mod.bias, 0)
    return m.state_dict()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_train", type=int, default=10000)
    ap.add_argument("--n_val", type=int, default=2000)
    ap.add_argument("--questions_per_image", type=int, default=5)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpeg_quality", type=int, default=88)
    args = ap.parse_args()

    from PIL import Image

    os.makedirs(os.path.join(args.out_dir, "imgs"), exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_images = (args.n_train + args.n_val) // args.questions_per_image
    names, answers = [], []
    for i in range(n_images):
        img, ans = make_image(rng, args.size)
        name = f"synth_{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(args.out_dir, "imgs", name),
                                  quality=args.jpeg_quality)
        # re-decode: the label must reflect what trainers actually see
        back = np.asarray(Image.open(os.path.join(args.out_dir, "imgs", name)))
        answers.append("yes" if back[..., 0].mean() > back[..., 2].mean() else "no")
        names.append(name)

    pairs = []
    for i, (name, ans) in enumerate(zip(names, answers)):
        for _ in range(args.questions_per_image):
            q = TEMPLATES[rng.integers(0, len(TEMPLATES))]
            pairs.append((name, q, ans))
    rng.shuffle(pairs)
    train, val = pairs[:args.n_train], pairs[args.n_train:args.n_train + args.n_val]
    write_split(os.path.join(args.out_dir, "train.txt"), train)
    write_split(os.path.join(args.out_dir, "val.txt"), val)

    from vqa_tpu.vocab import save_vocab
    save_vocab(os.path.join(args.out_dir, "train.txt"),
               os.path.join(args.out_dir, "vocab.pkl"), min_word_count=1, K=2)

    import torch
    torch.save(make_vgg11_bn_state_dict(args.seed),
               os.path.join(args.out_dir, "vgg11_bn_synth.pth"))

    ys = sum(1 for _, _, a in train if a == "yes")
    print(f"{args.out_dir}: {len(train)} train / {len(val)} val pairs over "
          f"{n_images} JPEGs; train yes-rate {ys / len(train):.3f}")


if __name__ == "__main__":
    main()
