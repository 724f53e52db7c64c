from .wav import Decoded, decode_bytes, decode_wav, snr_db, synth_sine_wav  # noqa: F401
from .fingerprint import (  # noqa: F401
    audio_dup_groups,
    fingerprint_key,
    spectral_tokens,
    with_fingerprint,
)
from .decode import (  # noqa: F401
    DECODED_DDL,
    decode_ok_rule,
    dur_consistency_rule,
    sr_consistency_rule,
    with_decoded,
)
