"""Regenerate the expected-output fixtures that back the oracle_sql()
entries for the deterministic non-SQL queries (round-2 VERDICT item 5:
convert rows-only checks into hard rows+schema+hash checks).

These queries are exactly reproducible given their committed seeds
(splitmix64 minhash permutations, FNV simhash, fixed hyperplanes,
content-hash-ordered IVF centroid samples, the deterministic clips
fixture): running them twice yields byte-identical
rounded outputs, so a committed parquet snapshot IS a valid oracle —
DuckDB reads it via read_parquet() and the driver's rows+schema+hash
compare applies in full. Regenerate ONLY when the underlying operator
semantics intentionally change:

    python scripts/gen_expected_outputs.py [sf_dir] [names...]

(names restrict regeneration to a subset — e.g. a newly added query —
so the unchanged snapshots stay byte-identical in git) and re-run
scripts/check_contract.py to confirm.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED = ["minhash_neardup_documents", "simhash_documents",
            "neardup_embeddings_lsh", "clips_full_audio",
            "lsh_topk_embeddings", "ivf_topk_embeddings",
            "clips_format_family", "clips_audio_features",
            "audio_level_clips", "audio_snr_clips",
            "audio_bandwidth_clips", "codec_consistency_clips",
            "curate_clips",
            "repair_audio_clips", "standardize_audio_clips",
            "trim_audio_clips",
            "audio_dup_clips", "audio_embed_neardup_clips",
            "audio_segments_clips", "transcript_conflict_content_clips"]

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "_fixtures", "expected")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("gen-expected").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    qs = entrymod.queries()
    only = [n for n in sys.argv[2:]]
    if only:
        unknown = [n for n in only if n not in EXPECTED]
        if unknown:
            raise SystemExit(f"not in EXPECTED: {unknown}")
    for name in (only or EXPECTED):
        pdf = qs[name](spark, sf_dir).toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(OUT_DIR, f"{name}.parquet"))
        print(f"wrote {name}: {len(pdf)} rows -> {OUT_DIR}/{name}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
