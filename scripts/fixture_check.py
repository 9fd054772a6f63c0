#!/usr/bin/env python3
"""Edge-case parity fixture: non-ASCII documents + degenerate embeddings.

The sf corpora happen to be pure-ASCII text and non-zero embeddings, so the
main oracle gate never exercises two classes of cross-engine landmine:

  1. byte-level oracles on multi-byte UTF-8 (m2/m3/m4/m9/m11 reconstruct
     payload bytes — a char-indexed oracle would silently diverge);
  2. divisions by a global max that is 0 on an all-zero embedding table
     (s13's max-|x| scale, s15's max-norm denominator).

This script builds a tiny corpus that hits both, runs graft.Verify on it
for exactly those queries, and replays scripts/check.py's compare. Run:

    python3 scripts/fixture_check.py

Expect "== 39 ok, 0 fail ==" (exit 0).
"""
import os, shutil, subprocess, sys

import duckdb

FIXTURE = "/tmp/graft_fixture"
OUT = "/tmp/graft_fixture_out"
QUERIES = [
    "m2_frame_sample",
    "m3_batch_featurize",
    "m4_resize",
    "m9_pcm_signal_stats",
    "m11_audio_fingerprint",
    "m12_scene_segments",
    "m13_keyframe_pick",
    "m14_png_decode",
    "m15_image_ahash_dedup",
    "m16_bmp_decode",
    "m17_jpeg_decode",
    "m18_phash_cross_codec",
    "t24_readability",
    "p27_bpe_pair_stats",
    "s17_multiprobe_lsh",
    "s18_recall_curve",
    "t25_perplexity_buckets",
    "d23_incremental_dedup",
    "d24_cluster_keep",
    "d27_keep_lsh",
    "d28_semdedup_wide",
    "d29_semdedup_adaptive",
    "d32_semdedup_capped",
    "d33_band_entropy_probe",
    "p23_pipeline_manifest",
    "p24_quality_curriculum",
    "p25_corpus_signature",
    "p26_chunk_windows",
    "s13_scalar_quant",
    "s15_mips_topk",
    "s16_batch_ann",
    "s19_hard_negatives",
    "s20_wide_ann",
    "s21_wide_recall",
    "s22_adaptive_ann",
    "s23_adaptive_recall",
    "s24_adaptive_negatives",
    "s25_adaptive_ivf",
    "t26_cms_token_freq",
    "t27_cms_certify",
    "d30_kmv_overlap",
]


def build_fixture():
    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(FIXTURE)
    con = duckdb.connect()
    # documents: force multi-byte UTF-8 (2-, 3-, 4-byte sequences), an empty
    # doc, and one long enough (>=132 bytes) to pass m2's frame filter.
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            (0, repeat('café naïve résumé ', 12), 'fr', 'fixture', 0),
            (1, repeat('中文文本', 16), 'zh', 'fixture', 0),
            (2, 'mixed ascii é中\U0001f600 tail', 'xx', 'fixture', 0),
            (3, '', 'en', 'fixture', 0),
            (4, repeat('plain ascii text ', 10), 'en', 'fixture', 0)
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{FIXTURE}/documents.parquet' (FORMAT PARQUET)
    """)
    # embeddings: ALL-ZERO vectors including the query row vec_id=0 -> both
    # s13's global max-|x| and s15's mx*q_nrm denominator are exactly 0.
    con.execute(f"""
        COPY (
          SELECT CAST(r AS BIGINT) AS vec_id,
                 CAST(list_transform(generate_series(1, 8), i -> 0.0)
                   AS FLOAT[]) AS embedding,
                 CAST(r % 3 AS INT) AS label
          FROM generate_series(0, 5) AS t(r)
        ) TO '{FIXTURE}/embeddings.parquet' (FORMAT PARQUET)
    """)


def main():
    build_fixture()
    shutil.rmtree(OUT, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {FIXTURE} {OUT} {','.join(QUERIES)}"],
        cwd=repo, env=env)
    if r.returncode != 0:
        print("FAIL: Verify run failed"); sys.exit(1)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "check.py"),
         FIXTURE, OUT])
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
