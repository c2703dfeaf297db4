from qmann_tpu.serve.engine import InferenceEngine, Request
from qmann_tpu.serve.packet import (
    IndexedSample, PacketDecoder, encode_sample, encode_response,
    decode_response, pack, unpack, write_sample_bin,
)

__all__ = [
    "InferenceEngine", "Request", "IndexedSample", "PacketDecoder",
    "encode_sample", "encode_response", "decode_response", "pack", "unpack",
    "write_sample_bin",
]
