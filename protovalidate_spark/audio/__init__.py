from .wav import Decoded, decode_bytes, decode_wav, snr_db, synth_sine_wav  # noqa: F401
from .decode import (  # noqa: F401
    DECODED_DDL,
    decode_ok_rule,
    dur_consistency_rule,
    sr_consistency_rule,
    with_decoded,
)
