"""Native C++ parser vs the Python pipeline: identical outputs."""
import os

import numpy as np
import pytest

from qmann_tpu.data import load_task
from qmann_tpu.data.native import load_task_native, native_available

PARSED = "/root/reference/MemN2N/dataset/en_10k_parsed"
RAW = "/root/reference/MemN2N/dataset/tasks_1-20_v1-2/en-10k"

needs_native = pytest.mark.skipif(
    not (native_available() and os.path.isdir(PARSED)),
    reason="native lib or dataset missing")


@needs_native
@pytest.mark.parametrize("task,use_raw", [
    ("qa1_single-supporting-fact", False),
    ("qa1_single-supporting-fact", True),
    ("qa2_two-supporting-facts", True),   # parsed train set missing
    ("qa7_counting", False),
])
def test_native_matches_python(task, use_raw):
    py = load_task(task, PARSED, raw_path=RAW, use_raw=use_raw,
                   limit_train=500, limit_test=200)
    nat = load_task_native(task, PARSED, raw_path=RAW, use_raw=use_raw,
                           limit_train=500, limit_test=200)
    assert nat.dims == py.dims
    assert nat.dictionary.words == py.dictionary.words
    for split in ("train", "valid", "test"):
        a, b = getattr(py, split), getattr(nat, split)
        np.testing.assert_array_equal(a.memory, b.memory, err_msg=split)
        np.testing.assert_array_equal(a.question, b.question)
        np.testing.assert_array_equal(a.answer, b.answer)
        np.testing.assert_array_equal(a.n_sen, b.n_sen)
        np.testing.assert_array_equal(a.answer_index, b.answer_index)


@needs_native
def test_native_full_task_shapes():
    nat = load_task_native("qa1_single-supporting-fact", PARSED, raw_path=RAW)
    assert len(nat.train) == 9000 and len(nat.valid) == 1000
    assert len(nat.test) == 1000


@needs_native
def test_native_shuffle_split_matches_python():
    """shuffle_split permutes vectorized rows natively, raw samples in
    Python — identical arrays either way (vectorization is per-sample)."""
    py = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                   limit_train=500, limit_test=100, shuffle_split=True,
                   split_seed=3)
    nat = load_task_native("qa1_single-supporting-fact", PARSED, raw_path=RAW,
                           limit_train=500, limit_test=100,
                           shuffle_split=True, split_seed=3)
    for split in ("train", "valid", "test"):
        a, b = getattr(py, split), getattr(nat, split)
        np.testing.assert_array_equal(a.memory, b.memory, err_msg=split)
        np.testing.assert_array_equal(a.question, b.question)
        np.testing.assert_array_equal(a.answer, b.answer)
        np.testing.assert_array_equal(a.answer_index, b.answer_index)


@needs_native
def test_native_dim_forced_matches_python():
    """DIM_FORCED (define.h:151): the native path expresses forced dims
    through its pad knobs; arrays and dims must match the Python
    compute_dims(dim_forced=True) layout."""
    kw = dict(limit_train=300, limit_test=50, dim_forced=True,
              max_dict_len=96, max_sen_len=50)
    py = load_task("qa1_single-supporting-fact", PARSED, raw_path=RAW, **kw)
    nat = load_task_native("qa1_single-supporting-fact", PARSED,
                           raw_path=RAW, **kw)
    assert py.dims.dim_dict == 96 and py.dims.dim_input == 96 + 50
    assert nat.dims.dim_dict == py.dims.dim_dict
    assert nat.dims.dim_input == py.dims.dim_input
    assert nat.dims.max_line == py.dims.max_line
    for split in ("train", "valid", "test"):
        a, b = getattr(py, split), getattr(nat, split)
        np.testing.assert_array_equal(a.memory, b.memory, err_msg=split)
        np.testing.assert_array_equal(a.question, b.question)
        np.testing.assert_array_equal(a.answer, b.answer)
