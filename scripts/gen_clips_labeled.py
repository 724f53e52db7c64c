"""Regenerate _fixtures/clips_labeled.parquet — a small deterministic
clips table (input_hint shape: clip_id, bytes, sr_hz, dur_ms, codec,
transcript) whose byte-duplicate structure exercises the
transcript-conflict gate (audio/consistency.py) end to end:

- byte-identical groups with genuinely conflicting transcripts,
- groups whose transcripts differ only in case/whitespace (NOT flagged),
- an all-NULL-transcript group (nothing to disagree about),
- a NULL-vs-empty-string group (flagged: '' is a bad label, NULL is a
  missing one — they disagree),
- a typo-level group (1 Levenshtein edit apart — flagged at the default
  edit_tolerance=0, tolerated at >=1),
- NULL-bytes rows (no content, excluded), and unique-bytes rows.

Byte-identity is exact by construction (same synth args ⇒ same WAV
bytes). DuckDB can read the binary column, so the contract query's
oracle is pure SQL over this file — no snapshot needed.

    python scripts/gen_clips_labeled.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_fixtures", "clips_labeled.parquet")


def rows():
    from protovalidate_spark.audio.wav import synth_sine_wav

    def wav(freq, sr=16000, dur=320, amp=0.5, fmt="pcm16"):
        return synth_sine_wav(freq, sr, dur, amp, fmt=fmt), sr, dur, fmt

    out = []

    def add(cid, payload, transcript):
        b, sr, dur, fmt = payload if payload else (None, 16000, 0, "pcm16")
        out.append({"clip_id": cid, "bytes": b, "sr_hz": sr, "dur_ms": dur,
                    "codec": fmt, "transcript": transcript})

    # A: conflicting text + a NULL in the mix -> all 3 flagged (3 labels)
    a = wav(440.0)
    add("a-00", a, "hello world")
    add("a-01", a, "hello word")
    add("a-02", a, None)
    # B: case/whitespace-only differences -> consistent, not flagged
    b = wav(523.25)
    add("b-00", b, "The Quick  Brown\tfox")
    add("b-01", b, " the quick brown fox ")
    # C: all-NULL transcripts -> not flagged
    c = wav(587.33)
    add("c-00", c, None)
    add("c-01", c, None)
    # D: empty string vs NULL -> flagged (2 labels)
    d = wav(659.25)
    add("d-00", d, "")
    add("d-01", d, None)
    # E: identical transcripts -> not flagged
    e = wav(698.46)
    add("e-00", e, "same text")
    add("e-01", e, "same text")
    # F: size-3 group, 2 labels -> ALL 3 rows flagged (majority too)
    f = wav(783.99)
    add("f-00", f, "a a")
    add("f-01", f, "a a")
    add("f-02", f, "b")
    # G: typo-level difference (1 edit) -> flagged at edit_tolerance=0,
    # tolerated at edit_tolerance>=1
    g = wav(830.61)
    add("g-00", g, "the color of water")
    add("g-01", g, "the colour of water")
    # NULL bytes: no content, excluded even though transcripts differ
    add("n-00", None, "ghost one")
    add("n-01", None, "ghost two")
    # unique bytes: never grouped
    for i, freq in enumerate([311.13, 349.23, 392.00, 415.30]):
        add(f"u-{i:02d}", wav(freq, dur=280), f"unique clip {i}")
    return out


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = rows()
    table = pa.table({
        "clip_id": pa.array([r["clip_id"] for r in data], pa.string()),
        "bytes": pa.array([r["bytes"] for r in data], pa.binary()),
        "sr_hz": pa.array([r["sr_hz"] for r in data], pa.int32()),
        "dur_ms": pa.array([r["dur_ms"] for r in data], pa.int32()),
        "codec": pa.array([r["codec"] for r in data], pa.string()),
        "transcript": pa.array([r["transcript"] for r in data], pa.string()),
    })
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
