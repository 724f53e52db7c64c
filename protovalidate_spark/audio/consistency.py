"""Transcript-label conflict detection: the same audio carrying
DIFFERENT transcripts.

A training-data labeling-error gate the plain dedup family cannot
express: exact/content dedup says "these clips are the same audio";
this check says "…and their labels disagree", which is how transcription
vendors' double-labeling mistakes, copy-paste errors, and pipeline
joins-gone-wrong surface in a speech corpus. Two key modes:

- ``key="exact"``: byte-identical audio (``md5(bytes)``) — pure JVM,
  zero Python, catches re-ingested files with re-labeled transcripts.
- ``key="content"``: spectral-fingerprint identity
  (:func:`~protovalidate_spark.audio.fingerprint.keyed_fingerprints`)
  — catches the same recording re-encoded (other rate / bit depth /
  gain) and labeled differently, which exact hashing can never see.

Transcripts are compared after normalization (lowercase, trim, collapse
internal whitespace) so formatting-only differences are NOT conflicts;
a NULL transcript in a group that also has real text IS a conflict (a
missing label disagrees with a present one), while a group that is
all-NULL has nothing to disagree about. An empty-after-normalization
string is kept distinct from NULL: it is a (bad) label, not a missing
one — the emptiness itself belongs to ``MIN_LEN`` rules, not here.

Scale shape (10^12 rows): ONE scan + ONE shuffle. The grouping is a
window over the key — not groupBy + join-back, which for content mode
would re-run the Arrow decode+FFT stage on the second branch (Catalyst
has no cross-branch CSE) and for exact mode would re-scan the audio
payload a second time. Column pruning means the shuffle carries only
(key, id, label, transcript) — the ``bytes`` payload never leaves the
scan stage; conflict groups are tiny in healthy data, so the per-key
``collect_set`` is bounded by group size. Non-content rows in content
mode get per-row sentinel keys upstream (no skewed NULL partition);
exact mode drops NULL-bytes rows before the shuffle for the same
reason.

Reference analog: protovalidate's cross-field consistency rules
(object-level ``WithRule`` after keys, pkg/rules/object.go:281-289)
lifted to a dataset-level invariant, emitting the same violation shape
(field path, rule id, actual) as every other check in the engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..errors import Code
from ..rules.base import violation_struct

#: sentinel label for a NULL transcript — distinct from every real
#: (non-NULL) normalized transcript, including the empty string
_NULL_LABEL = "\x01<null>"


def transcript_label(col: Column, normalize: bool = True) -> Column:
    """The comparison label for a transcript: normalized text, or the
    NULL sentinel. Normalization = lowercase, trim, collapse runs of
    whitespace — the differences a re-typed label should not be flagged
    for."""
    lbl = col.cast("string")
    if normalize:
        lbl = F.regexp_replace(F.trim(F.lower(lbl)), r"\s+", " ")
    return F.coalesce(lbl, F.lit(_NULL_LABEL))


def transcript_conflicts(
    df: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes",
    transcript_col: str = "transcript", key: str = "exact",
    normalize: bool = True, edit_tolerance: int = 0, chunks: int = 4,
    peaks: int = 3, min_rel_mag: float = 0.1,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per clip whose audio group carries conflicting
    transcripts: (id, group_id, group_size, n_transcripts, transcript
    [, keep_cols...] — extra row keys carried through the shuffle for
    violation-row assembly).
    ``group_id`` is the group's smallest clip id (the same keeper
    convention as :func:`audio_dup_groups`); ``n_transcripts`` counts
    distinct normalized labels in the group (>1 by construction).

    ``edit_tolerance`` > 0 relaxes "different" to "further than N
    Levenshtein edits from the group's reference label" (the keeper's
    first non-NULL normalized transcript, by id order) — typo-level
    re-labelings stop counting as conflicts, still entirely JVM-side
    (``F.levenshtein``). Distances are measured against the reference,
    not pairwise (triangle inequality bounds any pairwise distance at
    2N); a NULL transcript in a group with real text conflicts
    REGARDLESS of tolerance — no edit count bridges a missing label."""
    if key == "exact":
        keyed = (df.filter(F.col(bytes_col).isNotNull())
                 .select(F.col(id_col).alias("id"),
                         F.md5(F.col(bytes_col)).alias("fp_key"),
                         F.lit(True).alias("is_content"),
                         F.col(transcript_col),
                         *[F.col(c) for c in keep_cols]))
    elif key == "content":
        from .fingerprint import keyed_fingerprints
        keyed = keyed_fingerprints(df, id_col, bytes_col, chunks, peaks,
                                   min_rel_mag,
                                   extra_cols=(transcript_col,
                                               *keep_cols))
    else:
        raise ValueError(f"key must be 'exact' or 'content', got {key!r}")
    lbl = transcript_label(F.col(transcript_col), normalize)
    w = Window.partitionBy("fp_key")
    out = (keyed
           .withColumn("group_size", F.count("*").over(w))
           .withColumn("group_id", F.min("id").over(w))
           .withColumn("n_transcripts",
                       F.size(F.collect_set(lbl).over(w))))
    if edit_tolerance > 0:
        # same single shuffle; the ordered frame adds only an
        # in-partition sort to pick the deterministic reference label
        txt = F.when(F.col(transcript_col).isNotNull(), lbl)
        wo = (Window.partitionBy("fp_key").orderBy("id")
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
        ref = F.first(txt, ignorenulls=True).over(wo)
        null_mix = (F.max(F.col(transcript_col).isNull().cast("int"))
                    .over(w) == 1) & ref.isNotNull()
        too_far = (F.max(F.when(txt.isNotNull(),
                                F.levenshtein(txt, ref))).over(w)
                   > edit_tolerance)
        conflict = null_mix | too_far
    else:
        conflict = F.col("n_transcripts") > 1
    return (out
            .withColumn("_conflict", conflict)
            .filter((F.col("group_size") > 1) & F.col("_conflict")
                    & F.col("is_content"))
            .select("id", "group_id", "group_size", "n_transcripts",
                    F.col(transcript_col).alias("transcript"),
                    *[F.col(c) for c in keep_cols]))


def transcript_conflict_violations(
    df: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes",
    transcript_col: str = "transcript", key: str = "exact",
    normalize: bool = True, row_key_cols: Sequence[str] = ("clip_id",),
    **kw,
) -> DataFrame:
    """The same check in the engine's standard violation shape:
    (row keys..., field_path, rule_id=CONSISTENT, message, actual).
    ``actual`` is this row's transcript; the message names the keeper
    clip so the conflicting group is recoverable without re-hashing.
    ``row_key_cols`` beyond ``id_col`` (e.g. a partition column) are
    carried through the conflict shuffle."""
    conflicts = transcript_conflicts(
        df, id_col, bytes_col, transcript_col, key, normalize,
        keep_cols=[c for c in row_key_cols if c != id_col], **kw)
    v = violation_struct(
        f"/{transcript_col}", Code.CONSISTENT,
        F.concat(F.lit(f"transcript conflicts with {key}-identical "
                       "audio in group of "),
                 F.col("group_size").cast("string"),
                 F.lit(" (keeper "), F.col("group_id"), F.lit(")")),
        F.col("transcript"),
    )
    keep = [F.col("id").alias(c) if c == id_col else F.col(c)
            for c in row_key_cols]
    return conflicts.select(*keep, v.alias("_v")).select(
        *row_key_cols,
        "_v.field_path", "_v.rule_id", "_v.message", "_v.actual")
