"""Data pipeline tests against the reference dataset fixtures
(/root/reference/MemN2N/dataset — read-only)."""
import os

import numpy as np
import pytest

from qmann_tpu.data import (
    Dictionary, compute_dims, load_task, parse_parsed_file, parse_raw_file,
    vectorize,
)

PARSED = "/root/reference/MemN2N/dataset/en_10k_parsed"
RAW = "/root/reference/MemN2N/dataset/tasks_1-20_v1-2/en-10k"

needs_data = pytest.mark.skipif(not os.path.isdir(PARSED),
                                reason="reference dataset not present")


@needs_data
def test_parse_parsed_qa1_header_and_first_sample():
    samples = parse_parsed_file(f"{PARSED}/qa1_single-supporting-fact_train_set",
                                limit=5)
    assert len(samples) == 5
    s0 = samples[0]
    assert s0.sentences == [["Mary", "moved", "to", "the", "bathroom"],
                            ["John", "went", "to", "the", "hallway"]]
    assert s0.question == ["Where", "is", "Mary"]
    assert s0.answer == ["bathroom"]


@needs_data
def test_raw_and_parsed_formats_agree_qa1():
    parsed = parse_parsed_file(f"{PARSED}/qa1_single-supporting-fact_train_set",
                               limit=200)
    raw = parse_raw_file(f"{RAW}/qa1_single-supporting-fact_train.txt",
                         limit=200)
    assert len(parsed) == len(raw)
    for p, r in zip(parsed, raw):
        assert p.sentences == r.sentences
        assert p.question == r.question
        assert p.answer == r.answer


@needs_data
@pytest.mark.parametrize("task", ["qa7_counting",
                                  "qa19_path-finding"])
def test_raw_and_parsed_formats_agree_other_tasks(task):
    parsed = parse_parsed_file(f"{PARSED}/{task}_train_set", limit=50)
    raw = parse_raw_file(f"{RAW}/{task}_train.txt", limit=50)
    for p, r in zip(parsed, raw):
        assert p.sentences == r.sentences
        assert p.question == r.question
        assert p.answer == r.answer


@needs_data
def test_load_task_falls_back_to_raw_when_parsed_missing():
    # the reference dataset ships without qa2's parsed train set
    assert not os.path.exists(f"{PARSED}/qa2_two-supporting-facts_train_set")
    td = load_task("qa2_two-supporting-facts", PARSED, raw_path=RAW,
                   limit_train=100, limit_test=50)
    assert len(td.train) == 90 and len(td.test) == 50


RAW_1K = "/root/reference/MemN2N/dataset/tasks_1-20_v1-2/en"


@needs_data
def test_truncation_to_most_recent_50():
    # qa3's 10k raw train file is absent from the reference checkout; the
    # 1k 'en' set has it and its stories also exceed 50 sentences
    samples = parse_raw_file(f"{RAW_1K}/qa3_three-supporting-facts_train.txt",
                             max_sen_len=50)
    assert max(len(s.sentences) for s in samples) <= 50
    # qa3 stories exceed 50 sentences, so truncation must actually trigger
    raw = parse_raw_file(f"{RAW_1K}/qa3_three-supporting-facts_train.txt",
                         max_sen_len=10**9)
    assert max(len(s.sentences) for s in raw) > 50
    # truncation keeps the most recent sentences
    long_idx = next(i for i, s in enumerate(raw) if len(s.sentences) > 50)
    assert samples[long_idx].sentences == raw[long_idx].sentences[-50:]


@needs_data
def test_load_task_qa3_uses_en_fallback():
    td = load_task("qa3_three-supporting-facts", PARSED, raw_path=RAW,
                   limit_train=100, limit_test=50)
    assert len(td.train) == 90 and len(td.test) == 50


@needs_data
def test_dictionary_null_and_case_insensitive():
    samples = parse_parsed_file(f"{PARSED}/qa1_single-supporting-fact_train_set",
                                limit=100)
    d = Dictionary.build(samples)
    assert d.words[0] == "NULL"
    assert d.lookup("null") == 0
    assert d.lookup("MARY") == d.lookup("Mary") >= 1
    assert d.lookup("zzz-not-a-word") == -1
    assert len(d) <= 64  # MAX_DICT_LEN for single tasks


@needs_data
def test_vectorization_temporal_encoding_and_bow():
    samples = parse_parsed_file(f"{PARSED}/qa1_single-supporting-fact_train_set",
                                limit=50)
    d = Dictionary.build(samples)
    dims = compute_dims(samples, d)
    v = vectorize(samples, d, dims)
    s0 = samples[0]
    ns = len(s0.sentences)
    # BoW counts of sentence words
    for j, sent in enumerate(s0.sentences):
        for w in sent:
            assert v.memory[0, j, d.lookup(w)] >= 1.0
        # temporal encoding: sentence j carries index dim_dict + ns - j - 1
        te = dims.dim_dict + ns - j - 1
        assert v.memory[0, j, te] == 1.0
        # exactly one TE slot per live row
        assert v.memory[0, j, dims.dim_dict:].sum() == 1.0
    # padded rows all-zero; mask correct
    assert v.memory[0, ns:].sum() == 0.0
    assert v.mask[0, :ns].all() and not v.mask[0, ns:].any()
    # question BoW and one-hot answer
    for w in s0.question:
        assert v.question[0, d.lookup(w)] >= 1.0
    assert v.answer[0].sum() == 1.0
    assert v.answer[0, v.answer_index[0]] == 1.0
    assert d.words[v.answer_index[0]].lower() == s0.answer[0].lower()


@needs_data
def test_load_task_split_sizes_and_dims():
    td = load_task("qa1_single-supporting-fact", PARSED, limit_test=1000)
    assert len(td.train) == 9000
    assert len(td.valid) == 1000
    assert len(td.test) == 1000
    assert td.dims.dim_input == td.dims.dim_dict + td.dims.max_line
    # qa1 en-10k stories are at most 10 sentences
    assert td.dims.max_line == 10
    # test answers resolve in the train dictionary
    assert (td.test.answer.sum(axis=1) > 0).all()


def test_time_noise_vectorization_shapes(rng):
    from qmann_tpu.data import Sample
    samples = [Sample([["a", "b"], ["c", "d"], ["e", "f"]], ["a"], ["b"])
               for _ in range(4)]
    d = Dictionary.build(samples)
    dims = compute_dims(samples, d)
    v = vectorize(samples, d, dims, rand_noise_time=0.5, is_train=True,
                  rng=rng)
    # every live row still has exactly one TE bit within range
    te_block = v.memory[:, :, dims.dim_dict:]
    assert (te_block.sum(axis=-1)[:, :3] == 1.0).all()


@needs_data
def test_joint_task_loads_real_joint_data():
    """EN_JOINT: the real qa_joint_train.txt ships in the 1k 'en' dir (the
    10k dir has only the joint test file); training reads it while testing
    reads the per-task file (MemN2N/MemN2N.c:520-533).  The joint file is
    ordered task-by-task, so a 2500-sample head spans several tasks."""
    td = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                   limit_train=2500, limit_test=40,
                   train_task_name="qa_joint")
    assert len(td.train) + len(td.valid) == 2500
    assert len(td.test) == 40
    # joint vocabulary exceeds any single task's
    assert td.dims.dim_dict > 30  # several tasks worth of vocabulary


def test_shuffle_split_randomizes_validation():
    """EN_SAMPLE_SHUFFLED split semantics (MemN2N.c:1046-1052, :1868):
    one global permutation up front, valid = its tail — a random 10%,
    not the last 10% in file order.  Crucial for EN_JOINT: qa_joint's
    train file is the task-ordered concat of tasks 1-20, so without the
    shuffle the whole validation set is qa19/qa20 answers (which is why
    the reference's joint block sets EN_SAMPLE_SHUFFLED true,
    define.h:177-191)."""
    plain = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                      limit_train=2000, limit_test=40,
                      train_task_name="qa_joint")
    shuf = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                     limit_train=2000, limit_test=40,
                     train_task_name="qa_joint", shuffle_split=True,
                     split_seed=0)
    # same multiset of samples overall, different split composition
    assert len(shuf.train) == len(plain.train)
    assert len(shuf.valid) == len(plain.valid)
    assert not np.array_equal(shuf.valid.question, plain.valid.question)
    # deterministic in the seed
    again = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                      limit_train=2000, limit_test=40,
                      train_task_name="qa_joint", shuffle_split=True,
                      split_seed=0)
    np.testing.assert_array_equal(shuf.valid.question, again.valid.question)
    np.testing.assert_array_equal(shuf.train.question, again.train.question)
    other = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                      limit_train=2000, limit_test=40,
                      train_task_name="qa_joint", shuffle_split=True,
                      split_seed=1)
    assert not np.array_equal(shuf.valid.question, other.valid.question)
    # the shuffled valid split mixes answer distributions (file-order valid
    # is a contiguous single-task block at 2000 samples)
    assert len(np.unique(shuf.valid.answer_index)) >= \
        len(np.unique(plain.valid.answer_index))
