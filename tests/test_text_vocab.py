"""Data-contract tests: text preprocessing, vocab build, pickle round-trip.

Golden cases mirror the reference semantics documented in SURVEY.md §2
(P10-P13) including the quirky pre-lowercase ``'s'`` drop rule.
"""

import pickle

import numpy as np
import pytest

from vqa_tpu.text import pad_sequences, preprocess_text
from vqa_tpu.vocab import (Vocab, build_answer, build_vocab,
                           filter_samples_by_label, load_vocab, save_vocab)


class TestPreprocessText:
    def test_docstring_example(self):
        assert preprocess_text("Man sleeping next to a cat on a bed.") == [
            "man", "sleeping", "next", "to", "a", "cat", "on", "a", "bed"]

    def test_comma_separated(self):
        assert preprocess_text("What,is,the,color?") == ["what", "is", "the", "color"]

    def test_apostrophe_s_dropped(self):
        # "What's" -> punctuation stripped -> "Whats"; a standalone "s" after
        # punctuation-split is dropped only in lowercase form
        assert preprocess_text("the dog 's bone") == ["the", "dog", "bone"]

    def test_uppercase_S_survives(self):
        # reference checks w != 's' BEFORE lowercasing: 'S' survives as 's'
        assert preprocess_text("S is a letter") == ["s", "is", "a", "letter"]

    def test_empty_tokens_dropped(self):
        assert preprocess_text("a  ,, !! b") == ["a", "b"]


class TestPadSequences:
    def test_pad(self):
        out = pad_sequences([3, 4, 5], 6)
        assert out.tolist() == [3, 4, 5, 0, 0, 0]
        assert out.dtype == np.int32

    def test_truncate(self):
        assert pad_sequences([1, 2, 3, 4], 2).tolist() == [1, 2]


@pytest.fixture
def dataset_lines():
    return [
        "img1.jpg\tWhat,is,the,cat,doing\tsleeping",
        "img2.jpg\tIs,the,cat,black\tyes",
        "img3.jpg\tWhat,color,is,the,cat\tblack",
        "img4.jpg\tIs,this,a,cat\tyes",
        "img5.jpg\tIs,the,dog,black,and,white,or,brown\tno",
    ]


class TestBuildVocab:
    def test_ids_and_order(self, dataset_lines):
        word2idx, idx2word, max_len = build_vocab(dataset_lines, min_word_count=1)
        assert word2idx["<PAD>"] == 0 and word2idx["<UNKNOWN>"] == 1
        # first-appearance order after helpers
        assert word2idx["what"] == 2 and word2idx["is"] == 3 and word2idx["the"] == 4
        assert max_len == 8
        assert idx2word[2] == "what"
        assert len(idx2word) == len(word2idx)

    def test_min_count_threshold(self, dataset_lines):
        word2idx, _, _ = build_vocab(dataset_lines, min_word_count=2)
        assert "cat" in word2idx and "is" in word2idx
        assert "doing" not in word2idx and "brown" not in word2idx

    def test_determinism(self, dataset_lines):
        a = build_vocab(dataset_lines, 1)
        b = build_vocab(dataset_lines, 1)
        assert a == b


class TestBuildAnswer:
    def test_topk_and_unknown(self, dataset_lines):
        label2idx, idx2label = build_answer(dataset_lines, K=2)
        assert label2idx["UNKNOWN"] == 0
        assert label2idx["yes"] == 1  # count 2, most frequent
        # ties (sleeping/black/no all count 1) break by first appearance
        assert label2idx["sleeping"] == 2
        assert len(label2idx) == 3
        assert idx2label[1] == "yes"


class TestVocabPersistence:
    def test_save_load_roundtrip(self, dataset_lines, tmp_path):
        train_file = tmp_path / "train.txt"
        train_file.write_text("\n".join(dataset_lines) + "\n")
        vocab_file = tmp_path / "vocab.pkl"
        save_vocab(str(train_file), str(vocab_file), min_word_count=1, K=2)

        vocab = load_vocab(str(vocab_file))
        # the contract: exactly these keys in insertion order (reference
        # main.py:94 unpacks positionally)
        assert list(vocab.keys()) == [
            "word2idx", "idx2word", "label2idx", "idx2label", "max_seq_length"]
        assert vocab["max_seq_length"] == 8

        v = Vocab.from_dict(vocab)
        assert v.size == len(vocab["word2idx"])
        assert v.num_labels == 3

    def test_reads_reference_style_pickle(self, tmp_path):
        # a pickle written by the reference loads unchanged
        ref = {"word2idx": {"<PAD>": 0, "<UNKNOWN>": 1, "hi": 2},
               "idx2word": {0: "<PAD>", 1: "<UNKNOWN>", 2: "hi"},
               "label2idx": {"UNKNOWN": 0, "yes": 1},
               "idx2label": {0: "UNKNOWN", 1: "yes"},
               "max_seq_length": 5}
        p = tmp_path / "ref_vocab.pkl"
        with open(p, "wb") as f:
            pickle.dump(ref, f, protocol=pickle.HIGHEST_PROTOCOL)
        v = Vocab.load(str(p))
        assert v.max_seq_length == 5 and v.word2idx["hi"] == 2

    def test_load_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_vocab(str(tmp_path / "nope.pkl"))


class TestFilterSamples:
    def test_filter(self, dataset_lines, tmp_path):
        f = tmp_path / "data.txt"
        f.write_text("\n".join(dataset_lines) + "\n")
        kept = filter_samples_by_label(str(f), ["yes", "no"])
        assert len(kept) == 3
        assert all(line.strip().split("\t")[2] in ("yes", "no") for line in kept)
