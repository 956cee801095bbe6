"""ETL tests: COCO filename padding, dataset file format, vocab side-output."""

import json
import pickle

import pytest

from vqa_tpu.datahelper import VQA
from vqa_tpu.prepare_data import coco_pad, image_affixes, main as prepare_main


def test_coco_pad():
    # 6-digit pad for COCO (prefix carries the other 6 zeros)
    assert coco_pad(9, True) == "000009"
    assert coco_pad(123456, True) == "123456"
    # 5-digit pad for abstract scenes
    assert coco_pad(42, False) == "00042"


def test_image_affixes():
    assert image_affixes("train", True, False) == ("COCO_train2014_000000", ".jpg")
    assert image_affixes("val", True, False) == ("COCO_val2014_000000", ".jpg")
    assert image_affixes("train", False, True) == ("abstract_v002_train2015_0000000", ".png")
    with pytest.raises(NotImplementedError):
        image_affixes("val", False, True)


@pytest.fixture
def vqa_json_files(tmp_path):
    annotations = {
        "info": {"version": "2.0"},
        "annotations": [
            {"image_id": 25, "question_id": 250, "question_type": "what is",
             "answer_type": "other", "multiple_choice_answer": "cat",
             "answers": [{"answer": "cat", "answer_id": 1}]},
            {"image_id": 25, "question_id": 251, "question_type": "is the",
             "answer_type": "yes/no", "multiple_choice_answer": "yes",
             "answers": [{"answer": "yes", "answer_id": 1}]},
            {"image_id": 7777, "question_id": 252, "question_type": "what color",
             "answer_type": "other", "multiple_choice_answer": "black",
             "answers": [{"answer": "black", "answer_id": 1}]},
        ],
    }
    questions = {
        "questions": [
            {"question_id": 250, "image_id": 25, "question": "What is on the bed?"},
            {"question_id": 251, "image_id": 25, "question": "Is the cat asleep?"},
            {"question_id": 252, "image_id": 7777, "question": "What color is the cat?"},
        ],
    }
    a = tmp_path / "annotations.json"
    q = tmp_path / "questions.json"
    a.write_text(json.dumps(annotations))
    q.write_text(json.dumps(questions))
    return str(a), str(q)


def test_datahelper_index(vqa_json_files):
    a, q = vqa_json_files
    helper = VQA(a, q)
    assert set(helper.getQuesIds()) == {250, 251, 252}
    assert helper.getQuesIds(imgIds=[25]) == [250, 251]
    assert helper.getQuesIds(ansTypes=["yes/no"]) == [251]
    assert helper.getImgIds(quesIds=[252]) == [7777]
    assert helper.loadQA(250)[0]["multiple_choice_answer"] == "cat"
    assert helper.qqa[251]["question"] == "Is the cat asleep?"


def test_prepare_data_end_to_end(vqa_json_files, tmp_path):
    a, q = vqa_json_files
    out = tmp_path / "vqa_train.txt"
    vocab = tmp_path / "vocab.pkl"
    prepare_main(["--balanced_real_images", "-s", "train", "-a", a, "-q", q,
                  "-o", str(out), "-v", str(vocab), "-c", "1", "-K", "10"])

    lines = out.read_text().strip().split("\n")
    assert lines[0] == "COCO_train2014_000000000025.jpg\tWhat,is,on,the,bed?\tcat"
    assert lines[1] == "COCO_train2014_000000000025.jpg\tIs,the,cat,asleep?\tyes"
    assert lines[2] == "COCO_train2014_000000007777.jpg\tWhat,color,is,the,cat?\tblack"

    with open(vocab, "rb") as f:
        v = pickle.load(f)
    assert v["word2idx"]["<PAD>"] == 0
    assert "cat" in v["word2idx"]
    assert v["label2idx"]["UNKNOWN"] == 0
    assert v["max_seq_length"] == 5


@pytest.mark.slow
def test_coco_drop_rehearsal(vqa_json_files, tmp_path):
    """Real-data-drop rehearsal (r3 VERDICT item 5c): VQA-v2 annotation +
    question JSON -> prepare_data ETL -> real JPEG files on disk under the
    COCO names the ETL emitted -> train CLI (real decode path, no
    --synthetic_images) -> test-mode eval from the checkpoint. When real
    COCO lands, this exact sequence is the run book."""
    import numpy as np
    from PIL import Image

    a, q = vqa_json_files
    out = tmp_path / "train.txt"
    vocab = tmp_path / "vocab.pkl"
    prepare_main(["--balanced_real_images", "-s", "train", "-a", a, "-q", q,
                  "-o", str(out), "-v", str(vocab), "-c", "1", "-K", "10"])

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = {ln.split("\t")[0] for ln in out.read_text().strip().split("\n")}
    assert names == {"COCO_train2014_000000000025.jpg",
                     "COCO_train2014_000000007777.jpg"}
    for name in names:
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(img_dir / name)

    from vqa_tpu.main import main as train_main
    expt = str(tmp_path / "expt")
    common = ["--model", "baseline", "--vocab_file", str(vocab),
              "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
              "--batch_size", "3", "--num_cls", "4", "--num_workers", "2",
              "--image_size", "32", "--opt_lvl", "0"]
    train_main(["--mode", "train", "--train_img", str(img_dir),
                "--train_file", str(out), "--num_epochs", "2",
                "--save_interval", "1", "--log_interval", "10"] + common)
    import os
    assert os.path.exists(f"{expt}/e/r/model_2.ckpt")

    results = tmp_path / "preds.txt"
    train_main(["--mode", "test", "--val_img", str(img_dir),
                "--val_file", str(out), "--model_ckpt", "model_2.ckpt",
                "--test_out", str(results)] + common)
    assert len(results.read_text().strip().split("\n")) == 3


def test_abstract_scenes_train(vqa_json_files, tmp_path):
    a, q = vqa_json_files
    out = tmp_path / "abstract.txt"
    prepare_main(["--abstract_scene_images", "-s", "train", "-a", a, "-q", q,
                  "-o", str(out)])
    lines = out.read_text().strip().split("\n")
    # 5-digit pad, .png postfix
    assert lines[0].startswith("abstract_v002_train2015_000000000025.png\t")


def test_abstract_scenes_val_unsupported(vqa_json_files, tmp_path):
    a, q = vqa_json_files
    with pytest.raises(NotImplementedError):
        prepare_main(["--abstract_scene_images", "-s", "val", "-a", a, "-q", q,
                      "-o", str(tmp_path / "x.txt")])
