"""Deterministic synthetic clips table (FIXTURES.md).

Schema per BASELINE.json input_hint:
``(clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
transcript:string)`` + ``part_date:date`` partition column + ``row_idx``
surrogate key (fixture artifact for keying violations on NULL clip_ids).

Everything derives from ``crc32(f"clip-{i:010d}")`` so generation is
bit-identical at any parallelism (Spark ``F.crc32`` == Python
``zlib.crc32``). Violations are injected where ``i % m == m // 2`` for
coprime prime moduli m (offset m//2 avoids i=0 hitting every modulus);
:func:`expected_violations` enumerates the same sets in pure Python — the
test oracle.

Generation is distributed: Spark ``range`` → JVM column expressions for
all scalar columns; WAV payloads via ONE Arrow-batched pandas UDF.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .audio.wav import synth_sine_wav

SR_CHOICES = [8000, 16000, 22050, 44100, 48000]

# injection moduli (coprime primes; FIXTURES.md §1) — hit when i % m == m//2
M_ID_NULL = 997
M_ID_DUP = 1013
M_BYTES_GARBAGE = 991
M_BYTES_NULL = 983
M_SR_MISMATCH = 977    # header 16000, column 44100
M_SR_RANGE = 1009      # column (and header) 4000
M_DUR_MISMATCH = 971   # column = generated + 500
M_DUR_ZERO = 1019      # column = generated = 0
M_CODEC_BAD = 1021     # 'xm'
M_TX_EMPTY = 1031
M_TX_NULL = 1033

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember fjord grove harbor inlet "
    "jetty knoll lagoon mesa nexus orchid prairie quarry ridge summit tundra "
    "upland vale willow yonder zenith basalt cobalt drift ellipse flux gamma "
    "helix ion jade krypton lumen marble nadir"
).split()
assert len(WORDS) == 64
_WORD_MIX = 2654435761  # Knuth multiplicative hash step

N_PARTITIONS = 16
EPOCH_DATE = "2026-01-01"


@dataclass(frozen=True)
class Profile:
    """Scale profile. ``dur_range_ms`` bounds payload size so fixtures stay
    disk-friendly; column *semantics* are identical at every scale."""
    n_rows: int
    dur_range_ms: int
    inject: bool = True
    sr_shift: bool = False  # drift fixture: 44100-heavy mix


TINY = Profile(n_rows=2080, dur_range_ms=1800)
TINY_CLEAN = Profile(n_rows=2080, dur_range_ms=1800, inject=False)
TINY_SHIFTED = Profile(n_rows=2080, dur_range_ms=1800, inject=False, sr_shift=True)
BENCH = Profile(n_rows=120_000, dur_range_ms=800)


def _hit(i, m):  # Column or int
    return (i % m) == (m // 2)


def clips_df(spark: SparkSession, profile: Profile = TINY,
             partitions: int = 0) -> DataFrame:
    """Distributed deterministic generation of the clips table."""
    n = profile.n_rows
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    base_id = F.format_string("clip-%010d", i)
    h = F.crc32(base_id)  # unsigned 32-bit, == zlib.crc32

    sr_arr = F.array(*[F.lit(s) for s in SR_CHOICES])
    if profile.sr_shift:
        # drift fixture: 44100 at 60%, rest uniform (FIXTURES.md §3)
        idx = F.pmod(h, F.lit(10))
        sr_base = F.when(idx < 6, F.lit(44100)).otherwise(
            F.element_at(sr_arr, F.pmod(idx - 6, F.lit(4)).cast("int") + 1))
    else:
        sr_base = F.element_at(sr_arr, F.pmod(h, F.lit(5)).cast("int") + 1)

    dur_base = (F.lit(200) + F.pmod(h, F.lit(profile.dur_range_ms))).cast("int")
    freq = (F.lit(220) + F.pmod(h, F.lit(660))).cast("int")

    cbucket = F.pmod(h, F.lit(100))
    codec_base = (F.when(cbucket < 70, "wav").when(cbucket < 85, "flac")
                   .when(cbucket < 95, "opus").otherwise("mp3"))

    tx_len = (F.lit(1) + F.pmod(h, F.lit(20))).cast("int")
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    transcript_base = F.array_join(
        F.transform(
            F.sequence(F.lit(0), tx_len - 1),
            lambda j: F.element_at(
                words_arr,
                F.pmod(h + j.cast("bigint") * F.lit(_WORD_MIX), F.lit(64))
                 .cast("int") + 1),
        ), " ")

    if profile.inject:
        clip_id = (F.when(_hit(i, M_ID_NULL), F.lit(None).cast("string"))
                    .when(_hit(i, M_ID_DUP), F.lit("clip-0000000001"))
                    .otherwise(base_id))
        col_sr = (F.when(_hit(i, M_SR_RANGE), F.lit(4000))
                   .when(_hit(i, M_SR_MISMATCH), F.lit(44100))
                   .otherwise(sr_base)).cast("int")
        gen_sr = (F.when(_hit(i, M_SR_RANGE), F.lit(4000))
                   .when(_hit(i, M_SR_MISMATCH), F.lit(16000))
                   .otherwise(sr_base)).cast("int")
        col_dur = (F.when(_hit(i, M_DUR_ZERO), F.lit(0))
                    .when(_hit(i, M_DUR_MISMATCH), dur_base + 500)
                    .otherwise(dur_base)).cast("int")
        gen_dur = (F.when(_hit(i, M_DUR_ZERO), F.lit(0))
                    .otherwise(dur_base)).cast("int")
        codec = F.when(_hit(i, M_CODEC_BAD), "xm").otherwise(codec_base)
        transcript = (F.when(_hit(i, M_TX_NULL), F.lit(None).cast("string"))
                       .when(_hit(i, M_TX_EMPTY), F.lit(""))
                       .otherwise(transcript_base))
        # bytes mode: 2=null, 1=garbage, 0=normal (null wins over garbage)
        mode = (F.when(_hit(i, M_BYTES_NULL), F.lit(2))
                 .when(_hit(i, M_BYTES_GARBAGE), F.lit(1))
                 .otherwise(F.lit(0))).cast("int")
    else:
        clip_id, col_sr, gen_sr = base_id, sr_base.cast("int"), sr_base.cast("int")
        col_dur, gen_dur = dur_base, dur_base
        codec, transcript = codec_base, transcript_base
        mode = F.lit(0).cast("int")

    part_date = F.date_add(F.lit(EPOCH_DATE).cast("date"),
                           F.pmod(i, F.lit(N_PARTITIONS)).cast("int"))

    out = df.select(
        i.alias("row_idx"),
        clip_id.alias("clip_id"),
        gen_sr.alias("__gen_sr"), gen_dur.alias("__gen_dur"),
        freq.alias("__freq"), h.alias("__h"), mode.alias("__mode"),
        col_sr.alias("sr_hz"), col_dur.alias("dur_ms"),
        codec.alias("codec"), transcript.alias("transcript"),
        part_date.alias("part_date"),
    )
    synth = pandas_udf(_synth_batch, T.BinaryType())
    out = out.withColumn(
        "bytes", synth("__gen_sr", "__gen_dur", "__freq", "__h", "__mode"))
    return out.select("row_idx", "clip_id", "bytes", "sr_hz", "dur_ms",
                      "codec", "transcript", "part_date")


def _synth_batch(sr: pd.Series, dur: pd.Series, freq: pd.Series,
                 h: pd.Series, mode: pd.Series) -> pd.Series:
    out = []
    for s, d, f, hh, m in zip(sr, dur, freq, h, mode):
        if m == 2:
            out.append(None)
        elif m == 1:
            out.append(_garbage_bytes(int(hh)))
        else:
            out.append(synth_sine_wav(int(f), int(s), int(d)))
    return pd.Series(out)


def _garbage_bytes(h: int) -> bytes:
    """Deterministic undecodable payload (no RIFF magic)."""
    return (str(h).encode() * 8)[:64]


def write_clips(spark: SparkSession, path: str, profile: Profile = TINY,
                partitions: int = 0) -> str:
    """Materialize as part_date-directory-partitioned Parquet (Iceberg
    layout emulation per FIXTURES.md §1). Uncompressed: real audio
    payloads are already codec-compressed (incompressible), so snappy on
    the bytes column would only add scan-side CPU without shrinking the
    table — matching production practice for binary media columns."""
    (clips_df(spark, profile, partitions)
     .write.mode("overwrite").option("compression", "none")
     .partitionBy("part_date").parquet(path))
    return path


# ---------------------------------------------------------------------------
# Pure-Python oracle (no Spark): expected violations for a profile.
# ---------------------------------------------------------------------------

def py_row(i: int, profile: Profile = TINY) -> dict:
    """Reference (pure Python) generation of row i — mirrors clips_df."""
    base_id = f"clip-{i:010d}"
    h = zlib.crc32(base_id.encode())
    if profile.sr_shift:
        idx = h % 10
        sr_base = 44100 if idx < 6 else SR_CHOICES[(idx - 6) % 4]
    else:
        sr_base = SR_CHOICES[h % 5]
    dur_base = 200 + h % profile.dur_range_ms
    cb = h % 100
    codec = "wav" if cb < 70 else "flac" if cb < 85 else "opus" if cb < 95 else "mp3"
    tx_len = 1 + h % 20
    transcript = " ".join(
        WORDS[(h + j * _WORD_MIX) % 64] for j in range(tx_len))
    row = {
        "row_idx": i, "clip_id": base_id, "sr_hz": sr_base, "dur_ms": dur_base,
        "gen_sr": sr_base, "gen_dur": dur_base, "codec": codec,
        "transcript": transcript, "freq": 220 + h % 660, "h": h,
        "bytes_mode": 0, "part": i % N_PARTITIONS,
    }
    if not profile.inject:
        return row
    hit = lambda m: i % m == m // 2  # noqa: E731
    if hit(M_ID_NULL):
        row["clip_id"] = None
    elif hit(M_ID_DUP):
        row["clip_id"] = "clip-0000000001"
    if hit(M_SR_RANGE):
        row["sr_hz"] = row["gen_sr"] = 4000
    elif hit(M_SR_MISMATCH):
        row["sr_hz"], row["gen_sr"] = 44100, 16000
    if hit(M_DUR_ZERO):
        row["dur_ms"] = row["gen_dur"] = 0
    elif hit(M_DUR_MISMATCH):
        row["dur_ms"] = row["gen_dur"] + 500
    if hit(M_CODEC_BAD):
        row["codec"] = "xm"
    if hit(M_TX_NULL):
        row["transcript"] = None
    elif hit(M_TX_EMPTY):
        row["transcript"] = ""
    if hit(M_BYTES_NULL):
        row["bytes_mode"] = 2
    elif hit(M_BYTES_GARBAGE):
        row["bytes_mode"] = 1
    return row


def expected_violations(profile: Profile = TINY) -> set:
    """Expected (row_idx, field_path, rule_id) triples for the FULL rule-set
    pass (FIXTURES.md §6) over ``clips_df(profile)``."""
    out = set()
    dup_rows = []
    for i in range(profile.n_rows):
        r = py_row(i, profile)
        if r["clip_id"] is None:
            out.add((i, "/clip_id", "REQUIRED"))
        if r["clip_id"] == "clip-0000000001":
            dup_rows.append(i)
        if r["bytes_mode"] == 2:
            out.add((i, "/bytes", "REQUIRED"))
        elif r["bytes_mode"] == 1:
            out.add((i, "/bytes", "DECODE"))
        if r["sr_hz"] < 8000:
            out.add((i, "/sr_hz", "MIN"))
        if r["sr_hz"] not in SR_CHOICES:
            out.add((i, "/sr_hz", "NOTALLOWED"))
        if r["bytes_mode"] == 0 and r["sr_hz"] != r["gen_sr"]:
            out.add((i, "/sr_hz", "CONSISTENT"))
        if r["dur_ms"] <= 0:
            out.add((i, "/dur_ms", "MIN_EXCLUSIVE"))
        if r["bytes_mode"] == 0 and abs(r["dur_ms"] - r["gen_dur"]) > 10:
            out.add((i, "/dur_ms", "CONSISTENT"))
        if r["codec"] not in ("wav", "flac", "opus", "mp3"):
            out.add((i, "/codec", "NOTALLOWED"))
            out.add((i, "/codec", "REF"))
        if r["transcript"] is None:
            out.add((i, "/transcript", "REQUIRED"))
        elif len(r["transcript"]) < 1:
            out.add((i, "/transcript", "MIN_LEN"))
    if len(dup_rows) > 1:
        for i in dup_rows:
            out.add((i, "/clip_id", "UNIQUE"))
    return out


def codecs_dim(spark: SparkSession) -> DataFrame:
    """Referential dimension (FIXTURES.md §2)."""
    return spark.createDataFrame(
        [("wav", True), ("flac", True), ("opus", False), ("mp3", False)],
        "codec string, lossless boolean")
