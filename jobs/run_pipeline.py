"""spark-submit entry point: end-to-end training-corpus pipeline.

Runs the FULL pre-training corpus pass as one job — raw corpus parquet in,
filtered + deduplicated corpus out — composing the graded stages the way
`run_dedup.py` runs the dedup story: language gate (stopword ratio) ->
quality gate (score + min length) -> near-dup removal (MinHash+LSH /
SimHash / exact) -> survivors with per-doc metrics attached.

Usage (local sandbox):
    python jobs/run_pipeline.py --corpus /root/testdata/sf0.01/documents.parquet \
        --out /tmp/pipeline_out [--method minhash|simhash|exact]
        [--quality-t 0.25] [--min-words 20] [--stop-ratio-t 0.05]
        [--threshold 0.5] [--cores 8]

Outputs under --out:
    survivors/     (id, text, n_words, quality) rows passing gates + dedup
    docs_to_drop/  (doc_id, component, is_dup) near-dup rows removed

Cluster packaging, same as run_cdc.py:
    spark-submit --py-files engine.zip jobs/run_pipeline.py --corpus s3://... \
        --out s3://...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True,
                    help="parquet file/dir with (doc_id, text, ...)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--method", choices=["minhash", "simhash", "exact"],
                    default="minhash")
    ap.add_argument("--threshold", type=float, default=None,
                    help="minhash: exact-Jaccard verification threshold "
                         "(default 0.5); simhash: max hamming in [0, 3]")
    ap.add_argument("--quality-t", type=float, default=0.25)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--stop-ratio-t", type=float, default=0.05)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from nifi_daffodil_spark.operators.corpus import corpus_pipeline
    from nifi_daffodil_spark.session import build_session

    spark = build_session(app_name="corpus-pipeline", cores=args.cores)
    corpus = spark.read.parquet(args.corpus)
    try:
        survivors, drops = corpus_pipeline(
            corpus,
            id_col=args.id_col,
            text_col=args.text_col,
            stop_ratio_t=args.stop_ratio_t,
            quality_t=args.quality_t,
            min_words=args.min_words,
            method=args.method,
            threshold=args.threshold,
            checkpoint_drops=True,  # drops is written AND anti-joined below
        )
    except ValueError as e:  # bad threshold for the method: clean CLI error
        ap.error(str(e))
    drops.write.mode("overwrite").parquet(os.path.join(args.out, "docs_to_drop"))
    survivors.write.mode("overwrite").parquet(os.path.join(args.out, "survivors"))

    n_in = corpus.count()
    n_drop = drops.count()
    n_out = spark.read.parquet(os.path.join(args.out, "survivors")).count()
    print(json.dumps({
        "method": args.method,
        "docs_in": n_in,
        "gated_out": n_in - n_out - n_drop,
        "dedup_dropped": n_drop,
        "survivors": n_out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
