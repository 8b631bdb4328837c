"""Shared DuckDB oracle-SQL fragments for the hash-based dedup ops.

These mirror ``kpipe_spark.functions.dedup`` expression-for-expression:
the cross-engine contract is md5 (identical digests for identical UTF-8
bytes in Spark / DuckDB / Python) plus pure integer arithmetic — the
affine minhash slot family over the Mersenne prime 2^31-1 and two
60-bit md5 lanes for the simhash bit votes. Every constant here must
stay in lockstep with ``dedup.slot_coefficients`` / ``dedup.md5_hash60``.
"""

from __future__ import annotations

from kpipe_spark.functions.dedup import (
    MINHASH_NUM_HASHES,
    MINHASH_ROWS_PER_BAND,
)


def minhash_ctes(
    num_hashes: int = MINHASH_NUM_HASHES,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    table: str = "documents",
) -> str:
    """MinHash candidate-pair CTE chain mirroring dedup.minhash_candidates
    for the given family. (a_i, b_i) closed forms inlined as SQL — keep
    identical to dedup.slot_coefficients. Defaults derive from the SAME
    constants the Spark side uses, so family tuning can't desync the
    oracle. ``table`` lets a caller hash a pre-transformed projection
    (p04 normalizes the arriving batch's text before signing it)."""
    return rf"""
    toks AS (
      -- degenerate docs excluded, mirroring minhash_signature_df's
      -- content guard (rlike '\S'): a null/whitespace-only text has no
      -- content to near-dup against. Empty-string tokens are filtered
      -- exactly as text.tokens() does, so tab-padded documents
      -- tokenize identically in both engines.
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM {table}
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), grams AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
      UNION ALL
      SELECT doc_id, array_to_string(t, ' ') AS g
      FROM toks WHERE len(t) < 3
    ), sh AS (
      SELECT DISTINCT doc_id, g FROM grams
    ), hh AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
               % 2147483647 AS h
      FROM sh
    ), slots AS (
      SELECT doc_id, k,
             min((((k * 2654435761 + 1) % 2147483647) * h
                  + (k * 40503 + 7) % 2147483647) % 2147483647) AS slot
      FROM hh, range({num_hashes}) t(k) GROUP BY doc_id, k
    ), bands AS (
      SELECT doc_id, k // {rows_per_band} AS band,
             string_agg(slot, '_' ORDER BY k) AS bucket
      FROM slots GROUP BY doc_id, k // {rows_per_band}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.doc_id < b.doc_id
    )
"""


MINHASH_CTES = minhash_ctes()

SIMHASH_CTES = r"""
    tok AS (
      -- '' filtered to mirror text.tokens(): a whitespace-only doc
      -- must vote on NO lanes (fingerprint 0), not on md5('')
      SELECT DISTINCT doc_id, t FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents) WHERE t <> ''
    ), lanes AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h1,
             CAST(concat('0x', substr(md5(t), 17, 15)) AS BIGINT) AS h2
      FROM tok
    ), votes AS (
      SELECT doc_id, k,
             sum(CASE WHEN ((CASE WHEN k < 32 THEN h1 >> k
                                  ELSE h2 >> (k - 32) END) & 1) = 1
                      THEN 1 ELSE -1 END) AS v
      FROM lanes, range(64) t(k) GROUP BY doc_id, k
    ), fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN
                        CASE WHEN k = 63 THEN -9223372036854775807 - 1
                             ELSE (1::BIGINT << k) END
                      ELSE 0 END) AS BIGINT) AS simhash64
      FROM votes GROUP BY doc_id
    ), sim AS (
      SELECT d.doc_id, coalesce(fp.simhash64, 0) AS simhash64
      FROM documents d LEFT JOIN fp USING (doc_id)
    )
"""


# Connected components of the MinHash candidate graph (requires the
# `cand` CTE from MINHASH_CTES and a WITH RECURSIVE header): min-label
# reachability fixpoint -> comp(id, cluster_id), covering ONLY docs
# that appear in at least one candidate pair — mirrors
# dedup.dup_components. Used by d24/d47/d52/d55/d65.
COMPONENTS_CTES = """
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b, id_a FROM cand
    ),
    reach(id, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.id
    ),
    comp AS (
      SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
    )
"""
