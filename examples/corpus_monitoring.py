#!/usr/bin/env python
"""Corpus MONITORING — the per-snapshot health report a production
training-data pipeline runs before admitting a new crawl, composing
the round-4 monitoring operators:

    d72 source KL drift        which source's token distribution moved
    d74 embedding drift        which label's vector centroid moved
    d73 Zipf fit               is the corpus still natural-language-shaped
    d75 vocab coverage curve   how much mass a K-token vocab captures
    d76 OOV rate               which documents fall outside the vocab
    d78 source dup rate        which source started shipping duplicates

In production each number is trended per snapshot and alerting
thresholds sit on the deltas; here we run one snapshot and check the
cross-operator invariants that make the report trustworthy:

  * KL drift is non-negative for every source (Gibbs' inequality)
  * embedding-centroid cosine is in [-1, 1] and L2 >= 0
  * the Zipf slope is negative (frequency falls with rank)
  * the coverage curve is monotone in K and hits 1.0 once K >= vocab
  * mean OOV mass equals 1 - coverage(top-16) over the same corpus
    (the two operators must agree on what "in-vocab" means)

Run: python examples/corpus_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-monitoring-example")
    spark.sparkContext.setLogLevel("ERROR")

    from kpipe_spark.queries import all_queries

    q = all_queries()

    kl = {r["source"]: r["kl_bits"]
          for r in q["d72_source_kl_drift"].build(spark, sf_dir).collect()}
    drift = q["d74_embedding_drift"].build(spark, sf_dir).collect()
    zipf = q["d73_zipf_fit"].build(spark, sf_dir).collect()[0]
    cov = {r["k"]: r["coverage_frac"]
           for r in q["d75_vocab_coverage"].build(spark, sf_dir).collect()}
    oov = q["d76_oov_rate"].build(spark, sf_dir).collect()
    dup = {r["source"]: r["dup_rate"]
           for r in q["d78_source_dup_rate"].build(spark, sf_dir).collect()}

    print(f"sources: {len(kl)}; max KL drift = {max(kl.values()):.4f} bits "
          f"({max(kl, key=kl.get)})")
    worst = min(drift, key=lambda r: r["centroid_cosine"] or 1.0)
    print(f"labels: {len(drift)}; most-drifted centroid = label "
          f"{worst['label']} (cosine {worst['centroid_cosine']})")
    print(f"zipf: slope {zipf['zipf_slope']}, vocab {zipf['n_vocab']}, "
          f"tokens {zipf['n_tokens']}")
    print("coverage:", {k: cov[k] for k in sorted(cov)})
    print(f"dup rate: max = {max(dup.values()):.4f} "
          f"({max(dup, key=dup.get)})")

    oov_tokens = sum(r["n_oov"] for r in oov)
    all_tokens = sum(r["n_tokens"] for r in oov)

    ks = sorted(cov)
    checks = {
        "kl_nonneg": all(v >= 0 for v in kl.values()),
        "cosine_bounded": all(
            r["centroid_cosine"] is None or -1 <= r["centroid_cosine"] <= 1
            for r in drift
        ),
        "l2_nonneg": all(r["centroid_l2"] >= 0 for r in drift),
        "zipf_negative": zipf["zipf_slope"] < 0,
        "coverage_monotone": all(
            cov[a] <= cov[b] for a, b in zip(ks, ks[1:])
        ),
        "coverage_saturates": (
            zipf["n_vocab"] > max(ks) or cov[max(ks)] == 1.0
        ),
        # d76's OOV mass and d75's coverage describe the same corpus:
        # total OOV fraction == 1 - coverage(top-16) (up to rounding)
        "oov_matches_coverage": abs(
            oov_tokens / all_tokens - (1.0 - cov[16])
        ) < 1e-3,
        "dup_rate_bounded": all(0.0 <= v <= 1.0 for v in dup.values()),
    }
    for name, ok in checks.items():
        if not ok:
            print(f"FAILED: {name}")
    print(f"corpus health invariants hold = {all(checks.values())}")


if __name__ == "__main__":
    main()
