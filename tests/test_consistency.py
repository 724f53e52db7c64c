"""Transcript-label conflict gate (audio/consistency.py): the same
audio carrying different transcripts, in both byte-exact and
spectral-content key modes."""

import os

import pytest
from pyspark.sql import functions as F

from protovalidate_spark.audio import (
    transcript_conflict_violations,
    transcript_conflicts,
)
from protovalidate_spark.audio.wav import synth_sine_wav

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "_fixtures", "clips_labeled.parquet")


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.read.parquet(FIXTURE)


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


class TestExactMode:
    def test_conflicting_groups_flagged(self, labeled):
        got = _by_id(transcript_conflicts(labeled))
        assert sorted(got) == ["a-00", "a-01", "a-02", "d-00", "d-01",
                               "f-00", "f-01", "f-02", "g-00", "g-01"]
        # whole group flagged, including rows holding the majority label
        assert got["f-01"]["group_size"] == 3
        assert got["f-01"]["n_transcripts"] == 2
        assert got["f-01"]["group_id"] == "f-00"

    def test_null_counts_as_distinct_label(self, labeled):
        got = _by_id(transcript_conflicts(labeled))
        # group a: two real labels + NULL = 3 distinct labels
        assert got["a-00"]["n_transcripts"] == 3
        # group d: '' vs NULL disagree
        assert got["d-00"]["n_transcripts"] == 2

    def test_normalization_suppresses_formatting_diffs(self, labeled):
        ids = set(_by_id(transcript_conflicts(labeled)))
        # group b differs only in case/whitespace; group c is all-NULL;
        # group e is identical text; null-bytes rows have no content
        assert not ids & {"b-00", "b-01", "c-00", "c-01", "e-00", "e-01",
                          "n-00", "n-01"}

    def test_normalize_off_flags_formatting_diffs(self, labeled):
        ids = set(_by_id(transcript_conflicts(labeled, normalize=False)))
        assert {"b-00", "b-01"} <= ids

    def test_violation_shape(self, labeled):
        rows = {r["clip_id"]: r
                for r in transcript_conflict_violations(labeled).collect()}
        v = rows["a-01"]
        assert v["field_path"] == "/transcript"
        assert v["rule_id"] == "CONSISTENT"
        assert "keeper a-00" in v["message"]
        assert v["actual"] == "hello word"
        assert rows["a-02"]["actual"] is None

    def test_plan_no_python_single_shuffle(self, labeled):
        plan = (transcript_conflicts(labeled)
                ._jdf.queryExecution().executedPlan().toString())
        assert "EvalPython" not in plan, "exact mode must stay JVM-side"
        assert plan.count("Exchange") == 1, (
            "one hash shuffle on the md5 key, nothing else")

    def test_bad_key_mode(self, labeled):
        with pytest.raises(ValueError, match="exact.*content"):
            transcript_conflicts(labeled, key="nope")


class TestEditTolerance:
    def test_typo_group_tolerated(self, labeled):
        ids = set(_by_id(transcript_conflicts(labeled, edit_tolerance=1)))
        # g: 'color' vs 'colour' is 1 edit -> tolerated
        assert not ids & {"g-00", "g-01"}
        # f: 'a a' vs 'b' is 3 edits -> still a conflict
        assert {"f-00", "f-01", "f-02"} <= ids

    def test_null_mix_conflicts_at_any_tolerance(self, labeled):
        ids = set(_by_id(transcript_conflicts(labeled, edit_tolerance=50)))
        # a has NULL + real text; d has '' + NULL — no edit count
        # bridges a missing label
        assert {"a-00", "a-01", "a-02", "d-00", "d-01"} <= ids
        # f's 3-edit gap IS within tolerance 50
        assert not ids & {"f-00", "f-01", "f-02"}

    def test_all_null_group_still_consistent(self, labeled):
        ids = set(_by_id(transcript_conflicts(labeled, edit_tolerance=1)))
        assert not ids & {"c-00", "c-01", "b-00", "b-01", "e-00", "e-01"}

    def test_tolerant_plan_still_single_shuffle(self, labeled):
        plan = (transcript_conflicts(labeled, edit_tolerance=1)
                ._jdf.queryExecution().executedPlan().toString())
        assert "EvalPython" not in plan
        assert plan.count("Exchange") == 1, (
            "the ordered reference-label frame must reuse the same "
            "hash partitioning, adding only an in-partition sort")


class TestContentMode:
    @pytest.fixture(scope="class")
    def reencoded(self, spark):
        rows = [
            # same recording, three encodings, two labels -> conflict
            ("g1-a", synth_sine_wav(440.0, 16000, 400, 0.5, fmt="pcm16"),
             "the cat sat"),
            ("g1-b", synth_sine_wav(440.0, 8000, 400, 0.3, fmt="pcm8"),
             "the cat sat"),
            ("g1-c", synth_sine_wav(440.0, 44100, 400, 0.25, fmt="float32"),
             "the dog sat"),
            # re-encoded + case/whitespace-only label diff -> consistent
            ("g2-a", synth_sine_wav(660.0, 16000, 400, 0.5, fmt="pcm16"),
             "Hello  There"),
            ("g2-b", synth_sine_wav(660.0, 8000, 400, 0.6, fmt="mulaw"),
             "hello there"),
            # distinct content sharing a transcript is NOT a conflict
            ("u1", synth_sine_wav(880.0, 16000, 400, 0.5), "same words"),
            ("u2", synth_sine_wav(1108.7, 16000, 400, 0.5), "same words"),
            ("x1", b"RIFF junk", "junk label"),
            ("x2", None, "no audio"),
        ]
        return spark.createDataFrame(
            rows, "clip_id string, bytes binary, transcript string")

    def test_reencoded_conflict_found(self, reencoded):
        got = _by_id(transcript_conflicts(reencoded, key="content"))
        assert sorted(got) == ["g1-a", "g1-b", "g1-c"]
        assert got["g1-c"]["group_id"] == "g1-a"
        assert got["g1-c"]["n_transcripts"] == 2

    def test_exact_mode_blind_to_reencoding(self, reencoded):
        # the same rows under byte identity: no duplicate bytes at all
        assert transcript_conflicts(reencoded, key="exact").count() == 0

    def test_single_decode_stage(self, reencoded):
        plan = (transcript_conflicts(reencoded, key="content")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("ArrowEvalPython") == 1, (
            "the decode+FFT stage must run exactly once")


class TestSuiteIntegration:
    def test_clips_suite_label_conflicts_flag(self, spark):
        """label_conflicts=True adds the byte-exact conflict check to
        the suite's dataset pass: two injected byte-identical rows with
        disagreeing transcripts emit /transcript CONSISTENT rows (the
        only source of that (path, rule) pair with audio_checks off);
        with the flag off the pair emits nothing."""
        import datetime as dt

        from protovalidate_spark.clips import clips_suite
        from protovalidate_spark.fixtures import TINY_CLEAN, clips_df

        base = clips_df(spark, TINY_CLEAN)
        wav = synth_sine_wav(440.0, 16000, 500)
        extra = spark.createDataFrame(
            [(10_000_001, "clip-dup-a", wav, 16000, 500, "wav",
              "label one", dt.date(2026, 1, 1)),
             (10_000_002, "clip-dup-b", wav, 16000, 500, "wav",
              "label two", dt.date(2026, 1, 1))],
            base.schema)
        df = base.unionByName(extra)

        def conflict_rows(suite):
            v = suite.run(df, persist=False).violations
            return {r["clip_id"]: r for r in v.filter(
                (F.col("field_path") == "/transcript")
                & (F.col("rule_id") == "CONSISTENT")).collect()}

        on = conflict_rows(clips_suite(spark, label_conflicts=True))
        # the injected pair is flagged (the TINY fixture also contains
        # NATURAL byte-collisions — synth bytes depend only on
        # (sr, dur, freq, mode) while transcripts vary per row — which
        # the gate correctly reports as label inconsistencies)
        assert {"clip-dup-a", "clip-dup-b"} <= set(on)
        assert on["clip-dup-a"]["row_idx"] == 10_000_001  # keys carried
        assert "keeper clip-dup-a" in on["clip-dup-b"]["message"]
        assert not conflict_rows(clips_suite(spark))
