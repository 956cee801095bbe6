"""Coverage for the datahelper query surface beyond the ETL path:
loadRes (official results format), showQA, info, question-type filters."""

import json

import pytest

from vqa_tpu.datahelper import VQA


@pytest.fixture
def files(tmp_path):
    annotations = {
        "info": {"description": "test", "version": "2.0"},
        "annotations": [
            {"image_id": 1, "question_id": 10, "question_type": "what is",
             "answer_type": "other", "multiple_choice_answer": "cat",
             "answers": [{"answer": "cat", "answer_id": 1},
                         {"answer": "kitten", "answer_id": 2}]},
            {"image_id": 2, "question_id": 11, "question_type": "is the",
             "answer_type": "yes/no", "multiple_choice_answer": "yes",
             "answers": [{"answer": "yes", "answer_id": 1}]},
        ],
    }
    questions = {
        "info": {"description": "test", "version": "2.0"},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "train2014",
        "license": {"url": "x"},
        "questions": [
            {"question_id": 10, "image_id": 1, "question": "What is on the mat?"},
            {"question_id": 11, "image_id": 2, "question": "Is the dog asleep?"},
        ],
    }
    a = tmp_path / "ann.json"
    q = tmp_path / "q.json"
    a.write_text(json.dumps(annotations))
    q.write_text(json.dumps(questions))
    return str(a), str(q), tmp_path


def test_question_type_filters(files):
    a, q, _ = files
    h = VQA(a, q)
    assert h.getQuesIds(quesTypes=["what is"]) == [10]
    assert h.getQuesIds(quesTypes="is the") == [11]  # scalar coerced to list
    assert h.getImgIds(ansTypes=["yes/no"]) == [2]
    assert h.getImgIds() == [1, 2]


def test_load_qa_scalar_and_list(files):
    a, q, _ = files
    h = VQA(a, q)
    assert h.loadQA(10)[0]["image_id"] == 1
    assert [x["question_id"] for x in h.loadQA([10, 11])] == [10, 11]


def test_show_qa_and_info(files, capsys):
    a, q, _ = files
    h = VQA(a, q)
    h.info()
    h.showQA(h.loadQA([10]))
    out = capsys.readouterr().out
    assert "What is on the mat?" in out
    assert "Answer 1: cat" in out
    assert "description: test" in out


def test_load_res_official_format(files):
    a, q, tmp_path = files
    h = VQA(a, q)
    results = [{"question_id": 10, "answer": "dog"},
               {"question_id": 11, "answer": "no"}]
    res_file = tmp_path / "results.json"
    res_file.write_text(json.dumps(results))
    res = h.loadRes(str(res_file), q)
    assert res.qa[10]["answer"] == "dog"
    assert res.qa[10]["image_id"] == 1          # backfilled from the GT index
    assert res.qa[11]["question_type"] == "is the"
    assert res.dataset["task_type"] == "Open-Ended"


def test_load_res_incomplete_raises(files):
    a, q, tmp_path = files
    h = VQA(a, q)
    res_file = tmp_path / "bad.json"
    res_file.write_text(json.dumps([{"question_id": 10, "answer": "dog"}]))
    with pytest.raises(AssertionError):
        h.loadRes(str(res_file), q)
