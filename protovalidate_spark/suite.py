"""ValidationSuite — the full rule-set pass (FIXTURES.md §6).

Combines:
- row-level object rule set (ONE projection, whole-stage codegen; audio
  decode wired in as ONE Arrow batch stage, decoded struct computed once
  and reused — SURVEY.md §4),
- dataset-level checks (uniqueness, referential, drift) which scan the RAW
  input (no decode cost),
- per-partition verdicts.

Scan budget at scale: row pass (1 scan incl. decode) + uniqueness
(1 scan of key column only — parquet column pruning) + referential
(1 scan of ref column only) + drift (1 scan of drifted columns) +
row-count agg (metadata-cheap). Violations are persisted (or written to a
sink) so verdict aggregation never re-runs the decode stage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .audio.decode import decode_ok_rule, with_decoded
from .dataset.drift import drift_violations
from .dataset.referential import ref_violations
from .dataset.stats import column_stats
from .dataset.uniqueness import unique_violations
from .rules.binary import BinaryRuleSet
from .rules.object import ObjectRuleSet


@dataclass
class RunResult:
    violations: DataFrame        # (row keys..., part?, field_path, rule_id, message, actual)
    verdicts: DataFrame          # (part, pass, rows_scanned, violations, wall_ms)
    stats: Optional[DataFrame]
    wall_ms: int
    # pre-cap stream when max_exemplars_per_rule > 0 (exact counts live
    # here); identical to `violations` otherwise
    violations_full: Optional[DataFrame] = None


@dataclass
class ValidationSuite:
    rules: ObjectRuleSet
    row_keys: Sequence[str] = ()
    partition_col: Optional[str] = None
    unique: Sequence[Sequence[str]] = ()             # e.g. [["clip_id"]]
    refs: Sequence[Tuple[str, DataFrame, str]] = ()  # (col, dim_df, dim_col)
    drift_baseline: Optional[Dict[str, dict]] = None
    psi_threshold: float = 0.2
    ks_threshold: float = 0.1
    # low-cardinality column to ALSO drift-check per group vs the same
    # global baseline (bad-shard detector); group rides the message
    drift_group_col: Optional[str] = None
    stats_cols: Sequence[str] = ()
    extra_object_rules: tuple = field(default_factory=tuple)
    salt_buckets: int = 0
    # bytes columns whose decode stage should ALSO emit PCM features
    # (peak/clip/silence/zcr/rms_dbfs/dc_offset) — same single Arrow
    # stage, same struct column name, so decode-consumer rules are
    # unaffected
    audio_features: Sequence[str] = ()
    # bytes columns whose decode stage should ALSO emit energy-VAD
    # fields (segments/speech_ratio/longest_gap_ms/snr_db) — implies the
    # feature fields too (features.with_full_audio): EVERY audio gate on
    # is still ONE Arrow stage and ONE decode
    audio_vad: Sequence[str] = ()
    # bytes columns whose decode stage should ALSO emit the
    # effective-bandwidth fields (rolloff_hz/bandwidth_ratio — upsample
    # detection, audio/bandwidth.py); implies features + VAD: the
    # everything-on stage stays ONE Arrow stage and ONE decode
    audio_bandwidth: Sequence[str] = ()
    # transcript-label conflict specs (audio/consistency.py): each dict
    # is kwargs for transcript_conflict_violations minus row_key_cols,
    # e.g. {"id_col": "clip_id", "bytes_col": "bytes",
    # "transcript_col": "transcript", "key": "exact"}
    label_conflicts: Sequence[dict] = ()
    # cross-row/cross-table integrity (dataset/integrity.py):
    # monotonic: kwargs for monotonic_violations minus df/row_key_cols
    monotonic: Sequence[dict] = ()
    # reconciliations: kwargs for reconciliation_violations minus `fact`
    # (the suite's df IS the fact side); violations ride with NULL row
    # keys, the dim key appended to the message (same group-drift style)
    reconciliations: Sequence[dict] = ()
    # volume anomaly specs: {"group_col": str, "max_rel_dev": float,
    # "min_count": Optional[int]}
    volume_specs: Sequence[dict] = ()
    # date columns whose calendar must be gap-free between min and max
    calendar_cols: Sequence[str] = ()
    # ingestion-freshness specs (dataset/integrity.py
    # freshness_violations): {"ts_col": str, "max_age_hours": float,
    # "as_of": str (pinned, never wall-clock), "group_col": Optional}
    freshness: Sequence[dict] = ()
    # embedding drift specs: {"col": str, "baseline": dict, ...} — NOTE:
    # eager (two tiny single-row agg jobs fire at plan-build time)
    embedding_drift: Sequence[dict] = ()
    # absolute stats assertions (dataset/stats.py
    # stats_bounds_violations specs: {"col", "max_null_rate",
    # "min_distinct"/"max_distinct", "min"/"max"}). NOTE: eager — the
    # one column_stats agg fires at plan-build time, like outliers
    stats_bounds: Sequence[dict] = ()
    # information-metric bound specs (dataset/metrics.py): each dict is
    # {"kind": "entropy", "cols": [...], "min_entropy"/"max_entropy"} |
    # {"kind": "corr", "col_x", "col_y", "min_r"/"max_r"} |
    # {"kind": "mi", "col_x", "col_y", "min_mi"/"max_mi"} — table-level
    # findings, NULL row keys like the drift family
    metrics: Sequence[dict] = ()
    # robust row-level outlier specs (dataset/outliers.py): each dict is
    # kwargs for iqr_outlier_violations / mad_outlier_violations minus
    # df/row_key_cols, plus "method": "iqr" (default) | "mad". NOTE:
    # eager unless "fences"/"params" (e.g. from a baseline snapshot) is
    # supplied — the parameter agg fires at plan-build time; the flag
    # pass itself is shuffle-free
    outliers: Sequence[dict] = ()
    # >0: bound the MATERIALIZED violation rows to the k deterministically
    # smallest (by row_keys) per (field_path, rule_id) — at 10^12 rows a
    # pervasive rule would otherwise materialize billions of rows into
    # the sink. Verdict counts stay EXACT (aggregated from the pre-cap
    # stream); only RunResult.violations / the runner's parquet sink are
    # capped. Skew-immune: the rank window gets a map-side partial
    # WindowGroupLimit, shuffle ≤ P·k per rule (errors.cap_exemplars)
    max_exemplars_per_rule: int = 0

    # ------------------------------------------------------------------

    def _decodable_cols(self):
        return [k.name for k in self.rules.keys
                if isinstance(k.rule_set, BinaryRuleSet)
                and k.rule_set.decodable_codec]

    def _keep(self):
        cols = list(self.row_keys)
        if self.partition_col:
            cols.append(self.partition_col)
        return cols

    def row_violations(self, df: DataFrame) -> DataFrame:
        """Row-level pass: decode stage (if any) + one validation projection."""
        rules = self.rules
        work = df
        for c in self._decodable_cols():
            if c in self.audio_bandwidth:
                from .audio.features import with_full_audio
                work = with_full_audio(work, bytes_col=c,
                                       out_col=f"__dec_{c}",
                                       bandwidth=True)
            elif c in self.audio_vad:
                from .audio.features import with_full_audio
                work = with_full_audio(work, bytes_col=c,
                                       out_col=f"__dec_{c}")
            elif c in self.audio_features:
                from .audio.features import with_decoded_features
                work = with_decoded_features(work, bytes_col=c,
                                             out_col=f"__dec_{c}")
            else:
                work = with_decoded(work, bytes_col=c, out_col=f"__dec_{c}")
            rules = rules.with_rule(decode_ok_rule(c, f"__dec_{c}"))
        for r in self.extra_object_rules:
            rules = rules.with_rule(r)
        if not rules.allow_unknown:
            rules = rules.with_unknown()  # engine-internal helper cols
        keep = self._keep()
        return rules.violations(work, row_key_cols=keep)

    def dataset_violations(self, df: DataFrame) -> list:
        keep = self._keep()
        out = []
        for cols in self.unique:
            out.append(unique_violations(
                df, list(cols), row_key_cols=keep,
                salt_buckets=self.salt_buckets))
        for col, dim, dim_col in self.refs:
            out.append(ref_violations(df, col, dim, dim_col, row_key_cols=keep))
        for spec in self.label_conflicts:
            from .audio.consistency import transcript_conflict_violations
            out.append(transcript_conflict_violations(
                df, row_key_cols=keep, **spec))
        null_keys = [F.lit(None).cast("string").alias(k) for k in self.row_keys]
        part = ([F.lit(None).cast("date").alias(self.partition_col)]
                if self.partition_col else [])

        def _tag(v: DataFrame, label_col: Optional[str] = None,
                 label_name: Optional[str] = None) -> DataFrame:
            """Project a table-level check's rows into the suite shape:
            NULL row keys; an identifying column rides in the message."""
            msg = (F.concat(F.col("message"), F.lit(f" [{label_name}="),
                            F.col(label_col).cast("string"), F.lit("]"))
                   if label_col else F.col("message"))
            return v.select(*null_keys, *part, "field_path", "rule_id",
                            msg.alias("message"), "actual")

        if self.stats_bounds:
            from .dataset.stats import stats_bounds_violations
            out.append(_tag(stats_bounds_violations(
                df, list(self.stats_bounds))))
        for spec in self.metrics:
            from .dataset.metrics import (correlation_violations,
                                          entropy_violations,
                                          mutual_information_violations)
            s_ = dict(spec)
            kind = s_.pop("kind")
            fn = {"entropy": entropy_violations,
                  "corr": correlation_violations,
                  "mi": mutual_information_violations}[kind]
            out.append(_tag(fn(df, **s_)))
        for spec in self.outliers:
            from .dataset.outliers import (iqr_outlier_violations,
                                           mad_outlier_violations)
            s = dict(spec)
            fn = (mad_outlier_violations if s.pop("method", "iqr") == "mad"
                  else iqr_outlier_violations)
            out.append(fn(df, row_key_cols=keep, **s))
        for spec in self.monotonic:
            from .dataset.integrity import monotonic_violations
            out.append(monotonic_violations(df, row_key_cols=keep, **spec))
        for spec in self.reconciliations:
            from .dataset.integrity import reconciliation_violations
            rv = reconciliation_violations(df, **spec)
            out.append(_tag(rv, spec["dim_key"], spec["dim_key"]))
        for spec in self.volume_specs:
            from .dataset.integrity import volume_anomalies
            gc = spec["group_col"]
            vv = volume_anomalies(
                df, F.col(gc), gc,
                max_rel_dev=spec.get("max_rel_dev", 0.5),
                min_count=spec.get("min_count"))
            out.append(_tag(vv, gc, gc))
        for c in self.calendar_cols:
            from .dataset.integrity import calendar_gap_violations
            out.append(_tag(calendar_gap_violations(df, F.col(c), c)))
        for spec in self.freshness:
            from .dataset.integrity import freshness_violations
            fv = freshness_violations(
                df, F.col(spec["ts_col"]), spec["ts_col"],
                spec["max_age_hours"], spec["as_of"],
                group_col=spec.get("group_col"))
            gc = spec.get("group_col")
            out.append(_tag(fv, gc, gc) if gc else _tag(fv))
        for spec in self.embedding_drift:
            from .dataset.embedding import embedding_drift_violations
            ev = embedding_drift_violations(
                df, spec["col"], spec["baseline"],
                z_threshold=spec.get("z_threshold", 1.0),
                max_drift_frac=spec.get("max_drift_frac", 0.1))
            out.append(_tag(ev))
        if self.drift_baseline:
            d = drift_violations(df, self.drift_baseline,
                                 self.psi_threshold, self.ks_threshold)
            out.append(d.select(*null_keys, *part,
                                "field_path", "rule_id", "message", "actual"))
            if self.drift_group_col:
                from .dataset.drift import drift_by_group_violations
                g = drift_by_group_violations(
                    df, self.drift_group_col, self.drift_baseline,
                    self.psi_threshold, self.ks_threshold)
                out.append(g.select(
                    *null_keys, *part, "field_path", "rule_id",
                    F.concat(F.col("message"),
                             F.lit(f" [{self.drift_group_col}="),
                             F.col(self.drift_group_col), F.lit("]"))
                    .alias("message"), "actual"))
        return out

    def run(self, df: DataFrame, with_stats: bool = False,
            persist: bool = True) -> RunResult:
        t0 = time.time()
        parts = [self.row_violations(df)] + self.dataset_violations(df)
        violations = parts[0]
        for p in parts[1:]:
            violations = violations.unionByName(p.select(*violations.columns))
        if persist:
            violations = violations.persist(StorageLevel.MEMORY_AND_DISK)

        if self.partition_col:
            pc = self.partition_col
            rows = df.groupBy(pc).agg(F.count(F.lit(1)).alias("rows_scanned"))
            vio = (violations.filter(F.col(pc).isNotNull())
                   .groupBy(pc).agg(F.count(F.lit(1)).alias("violations")))
            verdicts = (
                rows.join(vio, on=pc, how="left")
                    .withColumn("violations", F.coalesce("violations", F.lit(0)))
                    .withColumn("pass", F.col("violations") == 0)
            )
        else:
            # lazy single-row verdict — no eager actions inside run()
            # (round-1 fired df.count() + violations.count() here, which
            # double-executed the decode plan when persist=False)
            rows = df.select(F.count(F.lit(1)).alias("rows_scanned"))
            vio = violations.select(F.count(F.lit(1)).alias("violations"))
            verdicts = (rows.crossJoin(vio)
                        .withColumn("pass", F.col("violations") == 0))

        stats = column_stats(df, list(self.stats_cols)) if with_stats else None
        out_violations = violations
        if self.max_exemplars_per_rule > 0:
            # verdicts above reference the PRE-cap (persisted) frame, so
            # their counts stay exact; only the returned rows are capped
            from .errors import cap_exemplars
            out_violations = cap_exemplars(
                violations, list(self.row_keys),
                self.max_exemplars_per_rule)
        wall_ms = int((time.time() - t0) * 1000)
        verdicts = verdicts.withColumn("wall_ms", F.lit(wall_ms))
        return RunResult(out_violations, verdicts, stats, wall_ms,
                         violations_full=violations)
