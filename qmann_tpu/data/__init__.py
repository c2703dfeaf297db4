from qmann_tpu.data.babi import (
    Sample, Dictionary, DataDims, VectorizedSplit, TaskData,
    parse_parsed_file, parse_raw_file, compute_dims, vectorize, load_task,
)

__all__ = [
    "Sample", "Dictionary", "DataDims", "VectorizedSplit", "TaskData",
    "parse_parsed_file", "parse_raw_file", "compute_dims", "vectorize",
    "load_task",
]
