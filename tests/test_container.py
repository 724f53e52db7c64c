"""Declared-codec vs container-format consistency
(audio/container.py): the metadata column's promise checked against
the RIFF header's actual format code — header-chain parse only."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protovalidate_spark import Object
from protovalidate_spark.audio.container import (
    codec_consistency_rule, container_format, with_container_format,
)
from protovalidate_spark.audio.wav import synth_sine_wav


def _wav(fmt, extensible=False):
    return synth_sine_wav(440.0, 8000, 60, 0.4, fmt=fmt,
                          extensible=extensible)


@pytest.mark.parametrize("fmt,code,bits", [
    ("pcm8", 1, 8), ("pcm16", 1, 16), ("pcm24", 1, 24), ("pcm32", 1, 32),
    ("float32", 3, 32), ("float64", 3, 64), ("alaw", 6, 8), ("mulaw", 7, 8),
])
def test_container_format_all_formats(fmt, code, bits):
    assert container_format(_wav(fmt)) == (True, code, bits)
    # EXTENSIBLE wrapper resolves to the same effective code
    assert container_format(_wav(fmt, extensible=True)) == (True, code, bits)


def test_container_format_garbage_and_null():
    assert container_format(b"not audio") == (False, -1, -1)
    assert container_format(None) == (False, -1, -1)
    assert container_format(b"RIFF\x00\x00\x00\x00WAVE") == (False, -1, -1)


def test_container_format_matches_decoder_on_later_fmt_chunk():
    """Later fmt chunk wins — the exact rule decode_wav uses, so the
    consistency check and the decoder never disagree."""
    import struct

    from protovalidate_spark.audio.wav import decode_wav
    base = bytearray(_wav("pcm16"))
    # append a second fmt chunk declaring A-law after the data chunk
    extra = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    blob = bytes(base) + extra
    ok, code, bits = container_format(blob)
    assert (ok, code, bits) == (True, 6, 8)
    # the decoder also honors the later fmt chunk (it will fail or
    # reinterpret, but never use the FIRST chunk's pcm16): A-law bits=8
    # over an even-length int16 payload still decodes as 8-bit samples
    d = decode_wav(blob)
    assert d.ok  # interpreted as A-law, NOT as the first chunk's pcm16


def test_codec_consistency_rule(spark):
    rows = [
        ("match_16", _wav("pcm16"), "pcm16"),
        ("match_coarse", _wav("alaw"), "wav"),   # coarse label admits all
        ("mismatch", _wav("alaw"), "pcm16"),     # telephony in a 16-bit lie
        ("mismatch_f", _wav("pcm16"), "float32"),
        ("unknown_codec", _wav("pcm16"), "opus"),  # membership/REF's job
        ("no_header", b"junk", "pcm16"),           # DECODE's job
        ("null_codec", _wav("pcm16"), None),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string")
    cf = with_container_format(df)
    rs = Object().with_unknown().with_rule(codec_consistency_rule())
    v = rs.violations(cf, row_key_cols=["clip_id"])
    got = {r["clip_id"]: r for r in v.collect()}
    assert set(got) == {"mismatch", "mismatch_f"}
    assert got["mismatch"]["rule_id"] == "CONSISTENT"
    assert got["mismatch"]["actual"] == "pcm16 vs fmt=6/bits=8"
    assert got["mismatch"]["field_path"] == "/codec"


def test_codec_consistency_plan_single_arrow_stage(spark):
    rows = [("a", _wav("pcm16"), "pcm16")]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string")
    cf = with_container_format(df)
    rs = Object().with_unknown().with_rule(codec_consistency_rule())
    v = rs.violations(cf, row_key_cols=["clip_id"])
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1  # membership test is JVM
