"""Large-scale training-data operators (north-star extensions).

kpipe has none of these — they're the data-pipeline capabilities a
100 TB corpus pipeline needs on top of the consumer surface:

- ``text``: tokenization, quality scoring, language ID, fingerprints
- ``dedup``: exact, MinHash-LSH, SimHash, n-gram Jaccard
- ``similarity``: embedding cosine, brute-force and LSH-bucketed top-k
- ``multimodal``: binary media columns with typed metadata

All are driver-collect-free and expressed with built-in functions where
possible (JVM codegen); Python appears only as Arrow-batched pandas UDFs.
"""
