"""Dataset ETL: VQA-v2 JSON -> flat ``img\\tq,tokens\\tans`` text file (+ vocab).

CLI-compatible with the reference's prepare_data.py (flags -s/-a/-q/-o/-v/-c/-K,
--balanced_real_images / --abstract_scene_images; reference
prepare_data.py:40-104), producing byte-identical dataset files:

- image name = COCO filename from image id via zero-padding to 12 digits total
  (``COCO_<split>2014_000000`` prefix + 6-digit pad, prepare_data.py:34-37,65-70);
- question = comma-joined whitespace tokens of the raw question string
  (prepare_data.py:93);
- answer = ``multiple_choice_answer`` (prepare_data.py:95).

Usage (train split, building the vocab too):
    python -m vqa_tpu.prepare_data --balanced_real_images -s train \\
        -a v2_mscoco_train2014_annotations.json \\
        -q v2_OpenEnded_mscoco_train2014_questions.json \\
        -o vqa_train2014.txt -v vocab_count_5_K_1000.pkl -c 5 -K 1000
"""

from __future__ import annotations

import argparse

from .datahelper import VQA
from .vocab import save_vocab


def coco_pad(num: int, balanced_real_images: bool) -> str:
    """Zero-pad an image id: 6 digits for COCO, 5 for abstract scenes.

    (Reference prepare_data.py:34-37 — the prefix already carries the leading
    zeros of the 12-digit COCO id.)
    """
    total_digits = 6 if balanced_real_images else 5
    s = str(num)
    return "0" * (total_digits - len(s)) + s


def image_affixes(split: str, balanced_real_images: bool, abstract_scene_images: bool):
    """(prefix, postfix) for image filenames per split/source (prepare_data.py:62-78)."""
    if balanced_real_images:
        prefix = f"COCO_{split}2014_000000"
        return prefix, ".jpg"
    if abstract_scene_images:
        if split != "train":
            raise NotImplementedError()
        return "abstract_v002_train2015_0000000", ".png"
    raise ValueError("exactly one of --balanced_real_images/--abstract_scene_images required")


def write_dataset(helper: VQA, output_file: str, split: str,
                  balanced_real_images: bool, abstract_scene_images: bool) -> int:
    """Write one ``img\\tq,tokens\\tans`` line per annotation; returns line count."""
    prefix, postfix = image_affixes(split, balanced_real_images, abstract_scene_images)
    annotations = helper.dataset["annotations"]
    with open(output_file, "w") as out:
        for ann in annotations:
            img_name = prefix + coco_pad(ann["image_id"], balanced_real_images) + postfix
            question = ",".join(helper.qqa[ann["question_id"]]["question"].strip().split())
            answer = ann["multiple_choice_answer"]
            out.write(f"{img_name}\t{question}\t{answer}\n")
    return len(annotations)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Prepare data for balanced real images QA aka COCO")
    parser.add_argument("-s", "--split", type=str, required=True, choices=["train", "val"],
                        help="split set")
    parser.add_argument("-a", "--annot_file", type=str, required=True,
                        help="path to annotations file (.json)")
    parser.add_argument("-q", "--ques_file", type=str, required=True,
                        help="path to questions file (.json)")
    parser.add_argument("-o", "--output_file", type=str, required=True,
                        help="output (img, ques, ans) dataset file .txt")
    parser.add_argument("-v", "--vocab_file", type=str,
                        help="output training set vocabulary file (.pkl)")
    parser.add_argument("-c", "--min_word_count", type=int, default=5,
                        help="min. word frequency for including in vocab")
    parser.add_argument("-K", "--num_cls", type=int, default=1000,
                        help="top-K most frequent answers as labels")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--balanced_real_images", action="store_true",
                       help="image format is COCO_train2014_000000xxxxxx.jpg")
    group.add_argument("--abstract_scene_images", action="store_true",
                       help="image format is abstract_v002_train2015_0000000xxxxx.png")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    assert args.balanced_real_images != args.abstract_scene_images

    helper = VQA(args.annot_file, args.ques_file)
    write_dataset(helper, args.output_file, args.split,
                  args.balanced_real_images, args.abstract_scene_images)
    print(f"Saved dataset file at: {args.output_file}")

    if args.vocab_file:
        save_vocab(args.output_file, args.vocab_file, args.min_word_count, args.num_cls)


if __name__ == "__main__":
    main()
