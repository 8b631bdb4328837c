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


def bpe_oracle_sql(num_merges: int = 8, table: str = "documents") -> str:
    """DuckDB oracle for BPE training (d28) — the iterative merge loop
    unrolled into ``num_merges`` chained CTE rounds, mirroring
    ``functions.bpe.train_bpe`` exactly.

    The merge-application trick: a word's symbol list is carried as a
    newline-framed string ``\\n sym \\n\\n sym \\n\\n ... \\n`` (symbols
    can never contain whitespace — they are characters/merges of
    whitespace-split tokens — so the framing is unambiguous), and
    applying merge (l, r) is ONE ``replace(s, '\\n'||l||'\\n\\n'||r||
    '\\n', '\\n'||l||r||'\\n')``: plain left-to-right non-overlapping
    substring replacement, which is exactly the BPE fold's semantics
    ([a,a,a] -> [aa,a], [a,a,a,a] -> [aa,aa]); the pattern consumes
    only ONE frame newline on each side, so the next symbol keeps its
    leading frame and chained merges stay left-to-right. Tie-break
    mirrors the Spark side: weight DESC, pair string ASC (both engines
    compare byte-wise).
    """
    nl = "chr(10)"
    sep = f"{nl} || {nl}"
    sql = [
        f"""
    WITH words AS (
      SELECT t AS word, count(*) AS weight FROM (
        SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS t
        FROM {table} WHERE text IS NOT NULL
      ) GROUP BY t
    ), vocab0 AS (
      SELECT {nl} || array_to_string(
               list_append(list_transform(range(1, length(word) + 1),
                                          i -> word[i]), '</w>'),
               {sep}) || {nl} AS s,
             weight
      FROM words
    )"""
    ]
    for k in range(num_merges):
        sql.append(
            f""", sy{k} AS (
      SELECT str_split(trim(s, {nl}), {sep}) AS syms, weight FROM vocab{k}
    ), pr{k} AS (
      SELECT unnest(list_transform(range(1, len(syms)),
             i -> syms[i] || ' ' || syms[i+1])) AS pair, weight
      FROM sy{k} WHERE len(syms) >= 2
    ), rule{k} AS (
      SELECT {k} AS rank,
             split_part(pair, ' ', 1) AS l,
             split_part(pair, ' ', 2) AS r,
             CAST(sum(weight) AS BIGINT) AS w
      FROM pr{k} GROUP BY pair
      ORDER BY sum(weight) DESC, pair ASC LIMIT 1
    ), vocab{k + 1} AS (
      SELECT replace(s, {nl} || l || {sep} || r || {nl},
                        {nl} || l || r || {nl}) AS s, weight
      FROM vocab{k} CROSS JOIN rule{k}
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM rule{k}" for k in range(num_merges)
    )
    sql.append(
        f"""
    SELECT rank, l AS "left", r AS "right", w AS pair_weight
    FROM ({union})
    ORDER BY rank"""
    )
    return "".join(sql)


def ivf_lloyd_oracle_sql(
    k: int = 16,
    iters: int = 5,
    nprobe: int = 2,
    topk: int = 5,
    n_queries: int = 8,
    scale: int = 1 << 20,
) -> str:
    """DuckDB oracle for d27 — integer-exact Lloyd-trained IVF search.

    Mirrors ``similarity.lloyd_centroids_int`` round for round:
    coordinates quantize to floor(x·scale) BIGINTs, each unrolled Lloyd
    iteration assigns by integer squared-L2 (ties to the lowest
    centroid_id), per-(cell, dim) integer sums feed floor-division
    means (numerator made divisible by subtracting a non-negative mod,
    so truncating ``//`` equals Python's floor ``//`` exactly), empty
    cells keep their centroid via the LEFT JOIN coalesce. The search
    tail is d13's oracle shape over the trained centroids dequantized
    as C/scale (exact in doubles).
    """
    sql = [
        f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT vec_id, e,
             list_transform(e, x -> CAST(floor(x * {float(scale)}) AS BIGINT)) AS qe
      FROM v
    ), c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
               AS centroid_id,
             qe AS c
      FROM q ORDER BY vec_id LIMIT {k}
    )"""
    ]
    for t in range(iters):
        sql.append(
            f""", a{t} AS (
      SELECT vec_id, qe, centroid_id FROM (
        SELECT q.vec_id, q.qe, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(q.qe) + 1),
                   i -> (q.qe[i] - c.c[i]) * (q.qe[i] - c.c[i]))),
                 c.centroid_id) AS rn
        FROM q, c{t} c) WHERE rn = 1
    ), s{t} AS (
      -- the embedding width comes from the DATA (zipped parallel
      -- unnests over list-context range + the vector), not a
      -- generator parameter: a fixture with a different width keeps
      -- the oracle exact instead of summing the wrong number of
      -- coordinates (round-11 ADVICE). DuckDB's table-function
      -- range() cannot take a correlated len(qe); list-context
      -- range() can, and same-SELECT unnests zip positionally.
      SELECT centroid_id, i, CAST(sum(val) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT centroid_id,
               unnest(range(1, len(qe) + 1)) AS i,
               unnest(qe) AS val
        FROM a{t})
      GROUP BY centroid_id, i
    ), c{t + 1} AS (
      SELECT p.centroid_id, coalesce(m.c, p.c) AS c
      FROM c{t} p LEFT JOIN (
        SELECT centroid_id,
               list(CAST((s - (((s % n) + n) % n)) // n AS BIGINT)
                    ORDER BY i) AS c
        FROM s{t} GROUP BY centroid_id) m USING (centroid_id)
    )"""
        )
    sql.append(
        f""", cents AS (
      SELECT centroid_id,
             list_transform(c, x -> CAST(x AS DOUBLE) / {float(scale)}) AS ce
      FROM c{iters}
    ), assigned AS (
      SELECT vec_id, e, centroid_id FROM (
        SELECT v.vec_id, v.e, c.centroid_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.centroid_id
               ) AS crn
        FROM v, cents c
      ) WHERE crn = 1
    ), probes AS (
      SELECT query_id, qe, centroid_id FROM (
        SELECT v.vec_id AS query_id, v.e AS qe, c.centroid_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.centroid_id
               ) AS crn
        FROM v, cents c WHERE v.vec_id < {n_queries}
      ) WHERE crn <= {nprobe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.qe, a.e) AS sim
      FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {topk}"""
    )
    return "".join(sql)
