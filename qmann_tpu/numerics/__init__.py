from qmann_tpu.numerics.fixed import (
    QFormat,
    ROUND_DOWN,
    ROUND_UP,
    ROUND_NEAREST_EVEN,
    ROUND_TOWARD_ZERO,
    FLOAT_PSEUDO,
    qformat_from_wl,
    fixed_max_float,
    fixed_min_float,
    float_quant,
    float_quant_blocks,
    fixed_mul,
    fixed_add,
    fixed_mac,
    encode_sign_magnitude,
    decode_sign_magnitude,
    quantize_ste,
    bin2gray,
    gray2bin,
)

__all__ = [
    "QFormat", "ROUND_DOWN", "ROUND_UP", "ROUND_NEAREST_EVEN",
    "ROUND_TOWARD_ZERO", "FLOAT_PSEUDO", "qformat_from_wl",
    "fixed_max_float", "fixed_min_float", "float_quant", "float_quant_blocks", "fixed_mul",
    "fixed_add", "fixed_mac", "encode_sign_magnitude",
    "decode_sign_magnitude", "quantize_ste", "bin2gray", "gray2bin",
]
