"""spark-submit entry point: end-to-end corpus deduplication.

Runs the full dedup story as ONE job — corpus parquet in, deduped corpus +
docs_to_drop out — composing the graded operators (MinHash+LSH pair
generation -> exact-Jaccard verification -> connected-component cluster
resolution -> keeper selection -> anti-join), the way `run_cdc.py` runs
the CDC story end-to-end. Reference analog: the reference is driven by
end-to-end processor tests (TestDaffodilProcessor.java:73-83), not
operator calls; this is the equivalent runnable surface for dedup.

Usage (local sandbox):
    python jobs/run_dedup.py --corpus /root/testdata/sf0.01/documents.parquet \
        --out /tmp/dedup_out [--method minhash|simhash|exact] [--threshold 0.5]
        [--n-hashes 16] [--max-bucket-size 64] [--cores 8]

Outputs under --out:
    docs_to_drop/   (doc_id, component, is_dup) — component = keeper id
    deduped/        the input columns, minus the dropped docs

Cluster packaging, same as run_cdc.py:
    spark-submit --py-files engine.zip jobs/run_dedup.py --corpus s3://... \
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
                         "(default 0.5); simhash: max hamming distance, "
                         "an integer in [0, 3] (default 3)")
    ap.add_argument("--n-hashes", type=int, default=16,
                    help="minhash: signature length (= bands at r=1)")
    ap.add_argument("--max-bucket-size", type=int, default=64,
                    help="minhash: drop LSH buckets larger than this "
                         "(quadratic-blowup cap; 0 disables)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from nifi_daffodil_spark.operators.text_dedup import dedup_corpus
    from nifi_daffodil_spark.session import build_session

    spark = build_session(app_name="corpus-dedup", cores=args.cores)
    corpus = spark.read.parquet(args.corpus)
    try:
        deduped, drops = dedup_corpus(
            corpus,
            id_col=args.id_col,
            text_col=args.text_col,
            method=args.method,
            threshold=args.threshold,  # None -> per-method default (0.5 / 3)
            n_hashes=args.n_hashes,
            max_bucket_size=args.max_bucket_size or None,
            checkpoint_drops=True,  # drops is written AND anti-joined below
        )
    except ValueError as e:  # bad threshold for the method: clean CLI error
        ap.error(str(e))
    drops.write.mode("overwrite").parquet(os.path.join(args.out, "docs_to_drop"))
    deduped.write.mode("overwrite").parquet(os.path.join(args.out, "deduped"))

    n_in = corpus.count()
    n_drop = drops.count()
    n_out = spark.read.parquet(os.path.join(args.out, "deduped")).count()
    n_clusters = drops.select("component").distinct().count()
    summary = {
        "method": args.method,
        "docs_in": n_in,
        "docs_dropped": n_drop,
        "docs_out": n_out,
        "dup_clusters": n_clusters,
    }
    if n_out != n_in - n_drop:
        # a real check, not an assert (stripped under python -O): duplicate
        # doc_id rows in the corpus make the anti-join remove more rows than
        # docs_to_drop names — surface it machine-readably with the outputs
        # already on disk so the operator can inspect them
        summary["error"] = (
            "deduped row count != docs_in - docs_dropped: the corpus has "
            "duplicate doc_id rows; outputs were written but are suspect"
        )
        print(json.dumps(summary))
        spark.stop()
        return 1
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
