"""Large-scale training-data operators (north-star extensions).

kpipe has none of these — they're the data-pipeline capabilities a
100 TB corpus pipeline needs on top of the consumer surface:

- ``text``: tokenization, quality scoring, language ID, fingerprints
- ``dedup``: exact, MinHash-LSH, SimHash, n-gram Jaccard
- ``corpus_index``: the stored band artifact as an API
  (build/attach/admit/append incremental admission)
- ``cluster_index``: the stored near-dup component artifact — pays
  the MinHash->components subtree once per corpus for every consumer
- ``dedup_reports``: the component-consumer bodies (d24/d47/d52/d55/
  d65) shared between inline-graded and stored-artifact forms
- ``similarity``: embedding cosine, brute-force and LSH-bucketed top-k
- ``selection``: token-budget greedy admission, DSIR importance
- ``mixing``: temperature-normalized source mixture weights
- ``monitoring``: hashed-bigram drift counts + per-source KL report
- ``bpe``: BPE merge training / tokenization
- ``prefix``: range-parallel exclusive prefix sums
- ``profiling``: column profiles, skew diagnostics
- ``multimodal``: binary media columns with typed metadata
- ``unigram``: unigram-LM tokenizer training + stored artifact
- ``sketches``: md5 hash lanes + the BloomGate stored artifact
  (fixed-memory admission gate, streaming-maintained)

All are driver-collect-free and expressed with built-in functions where
possible (JVM codegen); Python appears only as Arrow-batched pandas UDFs.
"""
