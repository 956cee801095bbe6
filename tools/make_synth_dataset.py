"""Deterministic synthetic VQA datasets for cross-framework accuracy parity.

Generates real JPEG files on disk plus reference-contract dataset artifacts
so the torch reference and vqa_tpu train on the *same* files end-to-end:

- imgs/synth_<i>.jpg images; train.txt / val.txt in the reference's
  `img \t q,tokens \t ans` format; vocab.pkl via vqa_tpu.vocab.save_vocab
  (reference pickle contract);
- vgg11_bn_synth.pth: a random-init state_dict with torchvision
  ``vgg11_bn``'s exact key set, loadable by BOTH frameworks via
  --vgg_wts_path (no pretrained download exists in this environment).

Two tasks (``--task``):

- ``redblue`` (BASELINE.json config 1: K=2): textured two-tone images; the
  answer is "yes" iff mean(R) > mean(B). Both frameworks ace this (99%+) —
  good for exact parity, no resolution for precision drift.
- ``grid`` (the r3 drift benchmark): each image is a 3x3 grid of colored
  cells (12-color palette) over noise/texture; each question names a grid
  position ("what,color,is,the,bottom,left,cell") and the answer is that
  cell's color — K=12, image x question JOINT reasoning (the same image
  carries up to 9 different answers), tuned so models land mid-band
  (60-90%) where a 1-2pp precision regression is visible. Difficulty
  knobs: --noise (pixel noise sigma), --cell_fill (colored fraction of
  each cell).

Usage: python tools/make_synth_dataset.py --out_dir /tmp/synthvqa [--task grid]
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


GRID_COLORS = {  # 12 names -> RGB; includes near pairs (red/pink/orange,
    "red": (220, 40, 40),     # blue/cyan/purple, white/gray) so precision
    "green": (40, 200, 60),   # loss has somewhere to show up
    "blue": (40, 80, 220),
    "yellow": (230, 220, 50),
    "purple": (150, 50, 200),
    "orange": (240, 140, 30),
    "white": (235, 235, 235),
    "black": (25, 25, 25),
    "pink": (240, 150, 190),
    "brown": (130, 80, 40),
    "gray": (128, 128, 128),
    "cyan": (60, 210, 220),
}

GRID_POS_3 = {(0, 0): "top,left", (0, 1): "top,middle", (0, 2): "top,right",
              (1, 0): "middle,left", (1, 1): "center", (1, 2): "middle,right",
              (2, 0): "bottom,left", (2, 1): "bottom,middle",
              (2, 2): "bottom,right"}

GRID_POS_2 = {(0, 0): "top,left", (0, 1): "top,right",
              (1, 0): "bottom,left", (1, 1): "bottom,right"}

GRID_TEMPLATES = [
    "what,color,is,the,{pos},cell",
    "which,color,fills,the,{pos},cell",
    "tell,me,the,color,of,the,{pos},cell",
    "the,{pos},cell,is,what,color",
]


def make_grid_image(rng: np.random.Generator, size: int, noise: float,
                    cell_fill: float, n: int, colors: list[str]):
    """n x n colored-cell image; returns (image, {(r,c): color_name})."""
    img = rng.uniform(90, 150, (size, size, 3)).astype(np.float32)
    # low-frequency background texture
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for c in range(3):
        img[..., c] += 25 * np.sin(2 * np.pi * (rng.uniform(1, 3) * xx
                                                + rng.uniform(1, 3) * yy))
    cells = {}
    cell = size // n
    pad = int(cell * (1 - cell_fill) / 2)
    for r in range(n):
        for c in range(n):
            name = colors[rng.integers(0, len(colors))]
            cells[(r, c)] = name
            col = np.asarray(GRID_COLORS[name], np.float32)
            col = col * rng.uniform(0.85, 1.15)          # brightness jitter
            y0, x0 = r * cell + pad, c * cell + pad
            y1, x1 = (r + 1) * cell - pad, (c + 1) * cell - pad
            img[y0:y1, x0:x1] = col
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), cells


def generate_grid(args, rng):
    """The K>=10 grid-color task: per-question answers from one image."""
    from PIL import Image

    n_images = (args.n_train + args.n_val) // args.questions_per_image
    pos_map = GRID_POS_2 if args.grid_n == 2 else GRID_POS_3
    colors = list(GRID_COLORS)[:args.n_colors]
    positions = list(pos_map)
    pairs = []
    for i in range(n_images):
        img, cells = make_grid_image(rng, args.size, args.noise,
                                     args.cell_fill, args.grid_n, colors)
        name = f"synth_{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(args.out_dir, "imgs", name),
                                  quality=args.jpeg_quality)
        # positions per image: the same image must answer differently per
        # question (joint reasoning, not an image prior); repeat positions
        # (different templates) when q-per-image exceeds the cell count
        ps = [positions[p] for p in
              rng.permutation(len(positions))[:args.questions_per_image]]
        while len(ps) < args.questions_per_image:
            ps.append(positions[rng.integers(0, len(positions))])
        for pos in ps:
            t = GRID_TEMPLATES[rng.integers(0, len(GRID_TEMPLATES))]
            q = t.format(pos=pos_map[pos])
            pairs.append((name, q, cells[pos]))
    rng.shuffle(pairs)
    return pairs


def write_split(path, pairs):
    with open(path, "w") as f:
        for name, q, a in pairs:
            f.write(f"{name}\t{q}\t{a}\n")


GRIDPAIR_TEMPLATES = [
    "what,colors,are,the,{p1},and,{p2},cells",
    "name,the,colors,of,the,{p1},cell,then,the,{p2},cell",
    "reading,{p1},first,then,{p2},which,colors,do,you,see",
    "give,the,{p1},cell,color,followed,by,the,{p2},cell,color",
]


def generate_gridpair(args, rng):
    """Production-head-width task (r4 VERDICT item 7): the question names
    TWO grid positions (ordered) and the answer is the compound
    "<color1>-<color2>" — K = n_colors^2 (144 at the default palette)
    genuine classes, trained into a --num_cls 1000 head so the accuracy
    gate exercises the reference's production head width
    (/root/reference/main.py:155) instead of the 13-way ladder head."""
    from PIL import Image

    n_images = (args.n_train + args.n_val) // args.questions_per_image
    pos_map = GRID_POS_2 if args.grid_n == 2 else GRID_POS_3
    colors = list(GRID_COLORS)[:args.n_colors]
    positions = list(pos_map)
    pairs = []
    for i in range(n_images):
        img, cells = make_grid_image(rng, args.size, args.noise,
                                     args.cell_fill, args.grid_n, colors)
        name = f"synth_{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(args.out_dir, "imgs", name),
                                  quality=args.jpeg_quality)
        for _ in range(args.questions_per_image):
            a, b = rng.permutation(len(positions))[:2]
            p1, p2 = positions[a], positions[b]
            t = GRIDPAIR_TEMPLATES[rng.integers(0, len(GRIDPAIR_TEMPLATES))]
            q = t.format(p1=pos_map[p1], p2=pos_map[p2])
            pairs.append((name, q, f"{cells[p1]}-{cells[p2]}"))
    rng.shuffle(pairs)
    return pairs


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
    ap.add_argument("--task", choices=["redblue", "grid", "gridpair"],
                    default="redblue")
    ap.add_argument("--noise", type=float, default=25.0,
                    help="grid task: pixel noise sigma (difficulty knob)")
    ap.add_argument("--cell_fill", type=float, default=0.7,
                    help="grid task: colored fraction of each cell side")
    ap.add_argument("--grid_n", type=int, default=3, choices=[2, 3],
                    help="grid task: cells per side (4 or 9 positions)")
    ap.add_argument("--n_colors", type=int, default=12,
                    help="grid task: palette size (answer classes)")
    args = ap.parse_args()

    from PIL import Image

    os.makedirs(os.path.join(args.out_dir, "imgs"), exist_ok=True)
    rng = np.random.default_rng(args.seed)

    if args.task == "grid":
        pairs = generate_grid(args, rng)
        K = args.n_colors
        n_images = (args.n_train + args.n_val) // args.questions_per_image
    elif args.task == "gridpair":
        pairs = generate_gridpair(args, rng)
        K = args.n_colors ** 2
        n_images = (args.n_train + args.n_val) // args.questions_per_image
    else:
        n_images = (args.n_train + args.n_val) // args.questions_per_image
        names, answers = [], []
        for i in range(n_images):
            img, ans = make_image(rng, args.size)
            name = f"synth_{i:06d}.jpg"
            Image.fromarray(img).save(
                os.path.join(args.out_dir, "imgs", name),
                quality=args.jpeg_quality)
            # re-decode: the label must reflect what trainers actually see
            back = np.asarray(Image.open(os.path.join(args.out_dir, "imgs", name)))
            answers.append("yes" if back[..., 0].mean() > back[..., 2].mean()
                           else "no")
            names.append(name)

        pairs = []
        for i, (name, ans) in enumerate(zip(names, answers)):
            for _ in range(args.questions_per_image):
                q = TEMPLATES[rng.integers(0, len(TEMPLATES))]
                pairs.append((name, q, ans))
        rng.shuffle(pairs)
        K = 2
    train, val = pairs[:args.n_train], pairs[args.n_train:args.n_train + args.n_val]
    write_split(os.path.join(args.out_dir, "train.txt"), train)
    write_split(os.path.join(args.out_dir, "val.txt"), val)

    from vqa_tpu.vocab import save_vocab
    save_vocab(os.path.join(args.out_dir, "train.txt"),
               os.path.join(args.out_dir, "vocab.pkl"), min_word_count=1, K=K)

    import torch
    torch.save(make_vgg11_bn_state_dict(args.seed),
               os.path.join(args.out_dir, "vgg11_bn_synth.pth"))

    from collections import Counter
    top = Counter(a for _, _, a in train).most_common(3)
    print(f"{args.out_dir}: task={args.task} {len(train)} train / {len(val)} "
          f"val pairs over {n_images} JPEGs; top answers {top}")


if __name__ == "__main__":
    main()
