"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline at sf0.001 (geocode -> cells -> density
tile pyramid).  ``queries()`` — one entry per implemented operator from
SURVEY.md §2.  ``oracle_sql()`` — matching DuckDB SQL for the
SQL-expressible subset (micro-coordinate geocoding is exact integer
arithmetic on both sides; see tilecloud_chain_ray/queries.py).

Ray is initialised by the driver before this module is imported — no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from tilecloud_chain_ray import queries as q

# --- shared SQL fragments (must mirror tilecloud_chain_ray/queries.py) ---

UX = "(doc_id * 2654435761) % 4294967296"
UY = "(doc_id * 2246822519 + 1013904223) % 4294967296"
# swissgrid_5 matrix dims per zoom (ceil(480000/span), ceil(320000/span))
ZOOM_DIMS = {0: (19, 13), 1: (38, 25), 2: (94, 63), 3: (188, 125), 4: (375, 250)}

# language marker scores: non-overlapping substring counts over ' '||text||' '
_MARKERS = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
    "it": (" il ", " e ", " di "),
}


def _score_sql(lang: str) -> str:
    parts = [
        f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '{m}', ''))) // {len(m)}"
        for m in _MARKERS[lang]
    ]
    return " + ".join(parts)


def entry() -> Any:
    """Flagship: documents sf0.001 -> geocode -> density pyramid z0-4."""
    return q.q_density_render("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "tile_assign_z3": q.q_tile_assign_z3,
        "tile_counts_per_zoom": q.q_tile_counts_per_zoom,
        "tile_counts_z14": q.q_tile_counts_z14,
        "cell_counts_r8": q.q_cell_counts_r8,
        "pip_layer_counts": q.q_pip_layer_counts,
        "pip_join_rows": q.q_pip_join_rows,  # left + inner modes in one entry
        "knn_cosine": q.q_knn_cosine,
        "dedup_exact": q.q_dedup_exact,
        "lang_stats": q.q_lang_stats,
        "lang_pred_counts": q.q_lang_pred_counts,
        "token_stats": q.q_token_stats,  # whitespace + BPE-ish in one entry
        # replaces quality_hist at the 50-entry driver cap: the quality
        # kernel stays anchored by quality_filter_counts (same scoring
        # expression) + curate_counts, and quality_hist keeps its SQL
        # parity check in tests/test_oracle_parity.py
        "substring_dedup": q.q_substring_dedup,
        "quality_filter_counts": q.q_quality_filter_counts,
        "events_tumbling": q.q_events_tumbling,
        "events_sliding": q.q_events_sliding,
        "events_range_join": q.q_events_range_join,
        "asof_purchase_click": q.q_asof_purchase_click,
        "lineitem_pricing": q.q_lineitem_pricing,
        "orders_topk": q.q_orders_topk,
        "region_customers": q.q_region_customers,
        "orders_lineitem_join": q.q_orders_lineitem_join,
        "anti_join_tiles": q.q_anti_join_tiles,
        "dimension_cross": q.q_dimension_cross,
        "tile_union_area_z2": q.q_tile_union_area_z2,
        "sessionize": q.q_sessionize,
        "sparse_metatile_counts": q.q_sparse_metatile_counts,
        "geom_filter_counts": q.q_geom_filter_counts,
        "vocab_topk": q.q_vocab_topk,
        "stratified_sample": q.q_stratified_sample,
        "token_quantiles": q.q_token_quantiles,
        "ngram_jaccard_pairs": q.q_ngram_jaccard_pairs,
        "decontam_counts": q.q_decontam_counts,
        "redaction_stats": q.q_redaction_stats,
        "knn_ivf_exact": q.q_knn_ivf_exact,
        "repetition_counts": q.q_repetition_counts,
        "pack_shards": q.q_pack_shards,
        "curate_counts": q.q_curate_counts,
        "user_event_pivot": q.q_user_event_pivot,
        "bloom_anti_join": q.q_bloom_anti_join,
        "lang_source_rollup": q.q_lang_source_rollup,
        # SQL-exact additions (round 3)
        "knn_cell_spatial": q.q_knn_cell_spatial,
        "density_tiles": q.q_density_tiles,
        "generate_point_hash": q.q_generate_point_hash,
        "fingerprints": q.q_fingerprints,
        "approx_distinct": q.q_approx_distinct,  # global + grouped in one entry
        "embed_near_dup": q.q_embed_near_dup,
        "dedup_minhash": q.q_dedup_minhash,
        "dedup_simhash": q.q_dedup_simhash,
        # raster->vector round-trip (render PNG -> decode -> pixel
        # counts), SQL-exact.  Replaces the rows-only knn_ann entry at
        # the 50-entry driver cap: the ANN surface stays anchored by
        # knn_cosine + knn_ivf_exact + knn_cell_spatial (all green) and
        # the LSH recall test (tests/test_ops.py::test_knn_lsh_recall).
        "vectorize_pixels": q.q_vectorize_pixels,
        # rows-only (non-SQL-expressible) check
        "media_pipeline": q.q_media_pipeline,
    }  # exactly 50 entries: the driver's correctness capture caps at 50


# distinct word-3-gram shingle strings of trim(text) (short texts ->
# their single joined form) — mirrors stages/curation.word_ngrams
_SHINGLES_SQL = r"""
    list_distinct(CASE
        WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 3
        THEN list_transform(
                 generate_series(1, len(regexp_split_to_array(trim(text), '\s+')) - 2),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' '
                   || regexp_split_to_array(trim(text), '\s+')[i+1] || ' '
                   || regexp_split_to_array(trim(text), '\s+')[i+2])
        ELSE [array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')]
    END)
"""


def _mix64_mul_sql(c: int) -> str:
    """x * c mod 2^64 over UBIGINT x via 32-bit split multiply in
    HUGEINT (DuckDB UBIGINT '*' raises on overflow instead of
    wrapping) — every intermediate stays < 2^97."""
    return (
        f"CAST(((CAST(x AS HUGEINT) % 4294967296) * {c} "
        f"+ ((CAST(x AS HUGEINT) // 4294967296) * {c}) % 4294967296 * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def _hll_sql() -> str:
    """HyperLogLog (p=12) in plain SQL, bit-for-bit the engine's
    stages/sketch.py: splitmix64 over the int64 key, idx = low 12
    bits, rank = 1-based first set bit of the remaining 52 (53 when
    zero), register-wise max, alpha*m^2/sum(2^-reg) with the
    small-range correction m*ln(m/zeros).  Register contents are
    integers on both sides, so the estimate floats agree exactly on
    the correction path (which small-cardinality test data always
    takes); alpha*m^2 is inlined with the same Python eval order as
    _hll_estimate."""
    alpha = 0.7213 / (1 + 1.079 / 4096)
    am2 = alpha * 4096 * 4096
    m1 = _mix64_mul_sql(0xBF58476D1CE4E5B9)
    m2 = _mix64_mul_sql(0x94D049BB133111EB)
    return f"""
        WITH ids AS (
            SELECT 'doc_id' AS scope, CAST(doc_id AS UBIGINT) AS k FROM documents
            UNION ALL
            SELECT 'users:' || event_type, CAST(user_id AS UBIGINT) FROM events
        ),
        h0 AS (SELECT scope, xor(k, k >> 30) AS x FROM ids),
        h1 AS (SELECT scope, {m1} AS h FROM h0),
        h2 AS (SELECT scope, xor(h, h >> 27) AS x FROM h1),
        h3 AS (SELECT scope, {m2} AS h FROM h2),
        hh AS (SELECT scope, xor(h, h >> 31) AS h FROM h3),
        rr AS (
            SELECT scope, CAST(h % 4096 AS BIGINT) AS idx,
                   CASE WHEN h // 4096 = 0 THEN 53
                        ELSE bit_count(xor(h // 4096, h // 4096 - 1)) END AS rank
            FROM hh
        ),
        regs AS (SELECT scope, idx, max(rank) AS r FROM rr GROUP BY scope, idx),
        agg AS (
            SELECT scope, 4096 - count(*) AS zeros, sum(power(2.0, -r)) AS s
            FROM regs GROUP BY scope
        )
        SELECT scope,
               CAST(round(CASE WHEN CAST({am2!r} AS DOUBLE) / (s + zeros) <= 10240.0
                                AND zeros > 0
                          THEN 4096 * ln(4096.0 / zeros)
                          ELSE CAST({am2!r} AS DOUBLE) / (s + zeros) END) AS BIGINT)
                   AS approx_distinct
        FROM agg
    """


_CRC_EXPR = (
    "xor(list_reduce(list_prepend(4294967295, "
    "list_transform(generate_series(1, strlen({w})), i -> CAST(unicode({w}[i]) AS BIGINT))), "
    "(acc, x) -> xor(acc >> 8, tbl[(xor(acc, x) & 255) + 1])), 4294967295)"
)


def _crc32_table() -> list[int]:
    out = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        out.append(c)
    return out


def _minhash_sql(threshold: float = 0.8, num_perm: int = 64, bands: int = 16) -> str:
    """The ENTIRE MinHash+LSH near-dup chain in DuckDB SQL, bit-for-bit
    the engine (stages/dedup.py): zlib.crc32 per word via a
    list_reduce over the standard 256-entry CRC table; 3-word shingle
    hashes by wraparound multiply-xor (HUGEINT split multiplies stand
    in for uint64 wraparound); the 64 seeded permutations a*h+b mod
    2^64 with min over shingles; per-band multiply-xor fold (>>1);
    candidate pairs sharing any (band, band_hash); exact Jaccard over
    distinct shingle-hash sets >= threshold.  The a/b permutation
    constants are read from the engine's own seeded MinHasher so the
    two sides cannot drift."""
    import numpy as np  # noqa: F401  (MinHasher needs numpy present)

    from tilecloud_chain_ray.stages.dedup import _SHINGLE_MULTS, MinHasher

    mh = MinHasher(num_perm, 7)
    M = [int(x) for x in _SHINGLE_MULTS]
    P64 = 18446744073709551616
    r = num_perm // bands
    perm_rows = ", ".join(
        f"({p}, {int(mh.a[p])}, {int(mh.b[p])}, {p // r}, {p % r}, {M[(p % r) % 3]})"
        for p in range(num_perm)
    )
    return f"""
        WITH crct(tbl) AS (SELECT [{",".join(map(str, _crc32_table()))}]),
        words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
        ),
        uw AS (SELECT DISTINCT unnest(ws) AS word FROM words),
        wcrc AS (
          SELECT word, {_CRC_EXPR.format(w='word')} AS crc
          FROM uw CROSS JOIN crct
        ),
        tok AS (
          SELECT doc_id, unnest(ws) AS word,
                 unnest(generate_series(1, len(ws))) AS i, len(ws) AS nw
          FROM words
        ),
        tokc AS (SELECT t.doc_id, t.i, t.nw, w.crc FROM tok t JOIN wcrc w USING (word)),
        sh0 AS (
          SELECT a.doc_id,
                 CAST(xor(xor(
                     CAST((CAST(a.crc AS HUGEINT) * {M[0]}) % {P64} AS UBIGINT),
                     CAST((CAST(b.crc AS HUGEINT) * {M[1]}) % {P64} AS UBIGINT)),
                     CAST((CAST(c.crc AS HUGEINT) * {M[2]}) % {P64} AS UBIGINT)) AS UBIGINT) AS sh
          FROM tokc a
          JOIN tokc b ON b.doc_id = a.doc_id AND b.i = a.i + 1
          JOIN tokc c ON c.doc_id = a.doc_id AND c.i = a.i + 2
          WHERE a.nw >= 3
        ),
        shshort AS (
          SELECT w.doc_id, CAST({_CRC_EXPR.format(w="array_to_string(w.ws, ' ')")} AS UBIGINT) AS sh
          FROM words w CROSS JOIN crct WHERE len(w.ws) < 3
        ),
        sh AS (SELECT DISTINCT doc_id, sh
               FROM (SELECT * FROM sh0 UNION ALL SELECT * FROM shshort)),
        perm(p, a, b, band, jj, m) AS (VALUES {perm_rows}),
        sig AS (
          SELECT s.doc_id, p.p, p.band, p.jj, p.m,
                 min(CAST(((CAST(s.sh AS HUGEINT) % 4294967296) * p.a
                     + ((CAST(s.sh AS HUGEINT) // 4294967296) * p.a) % 4294967296 * 4294967296
                     + p.b) % {P64} AS UBIGINT)) AS v
          FROM sh s CROSS JOIN perm p
          GROUP BY s.doc_id, p.p, p.band, p.jj, p.m
        ),
        folded AS (
          SELECT doc_id, band,
                 bit_xor(CAST(((CAST(v AS HUGEINT) % 4294967296) * m
                         + ((CAST(v AS HUGEINT) // 4294967296) * m) % 4294967296 * 4294967296
                         + jj) % {P64} AS UBIGINT)) AS f
          FROM sig GROUP BY doc_id, band
        ),
        bh AS (SELECT doc_id, band, CAST(f >> 1 AS BIGINT) AS band_hash FROM folded),
        cand AS (
          SELECT DISTINCT x.doc_id AS key_a, y.doc_id AS key_b
          FROM bh x JOIN bh y ON x.band = y.band AND x.band_hash = y.band_hash
                             AND x.doc_id < y.doc_id
        ),
        cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.key_a, c.key_b, count(*) AS ni
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.key_a
          JOIN sh sb ON sb.doc_id = c.key_b AND sb.sh = sa.sh
          GROUP BY c.key_a, c.key_b
        )
        SELECT c.key_a, c.key_b
        FROM cand c
        JOIN inter i USING (key_a, key_b)
        JOIN cnt ca ON ca.doc_id = c.key_a
        JOIN cnt cb ON cb.doc_id = c.key_b
        WHERE i.ni * 1.0 / (ca.n + cb.n - i.ni) >= {threshold!r}
    """


def _simhash_sql(max_hamming: int = 3) -> str:
    """SimHash near-dup candidates in DuckDB SQL, bit-for-bit the
    engine (stages/dedup.simhash_batch / simhash_candidates): per-word
    64-bit hash = crc32(word, seed=0xABCD) << 32 | crc32(word) (a
    seeded zlib.crc32 is the same table loop started from
    seed ^ 0xFFFFFFFF); per-bit majority vote over word OCCURRENCES
    (2*ones > n_words); pigeonhole blocking on the 4 16-bit quarters;
    hamming via bit_count(xor) <= max_hamming."""
    crct = ",".join(map(str, _crc32_table()))
    crc_seeded = _CRC_EXPR.replace("4294967295,", str(0xABCD ^ 0xFFFFFFFF) + ",", 1)
    return f"""
        WITH crct(tbl) AS (SELECT [{crct}]),
        words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS word FROM words),
        uw AS (SELECT DISTINCT word FROM tok),
        wh AS (
          SELECT word,
                 CAST({crc_seeded.format(w='word')} AS UBIGINT) * 4294967296
               + CAST({_CRC_EXPR.format(w='word')} AS UBIGINT) AS h64
          FROM uw CROSS JOIN crct
        ),
        occ AS (SELECT t.doc_id, w.h64 FROM tok t JOIN wh w USING (word)),
        nw AS (SELECT doc_id, count(*) AS n FROM occ GROUP BY doc_id),
        bits(i) AS (SELECT * FROM range(0, 64)),
        ones AS (
          SELECT o.doc_id, b.i, sum(CASE WHEN (o.h64 >> b.i) & 1 = 1 THEN 1 ELSE 0 END) AS ones
          FROM occ o CROSS JOIN bits b GROUP BY o.doc_id, b.i
        ),
        sim AS (
          SELECT o.doc_id,
                 bit_or(CASE WHEN 2 * o.ones > nw.n
                        THEN CAST(1 AS UBIGINT) << o.i ELSE CAST(0 AS UBIGINT) END) AS sh
          FROM ones o JOIN nw USING (doc_id) GROUP BY o.doc_id
        ),
        part AS (SELECT doc_id, sh, unnest([0,1,2,3]) AS b FROM sim),
        pv AS (SELECT doc_id, sh, b, CAST((sh >> (16 * b)) & 65535 AS BIGINT) AS v FROM part)
        SELECT DISTINCT x.doc_id AS key_a, y.doc_id AS key_b,
               CAST(bit_count(xor(x.sh, y.sh)) AS BIGINT) AS hamming
        FROM pv x JOIN pv y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.sh, y.sh)) <= {max_hamming}
    """


def _embed_near_dup_sql(threshold: float = 0.35, n_planes: int = 4, dim: int = 64) -> str:
    """Hyperplane-LSH near-dup in SQL: the seeded plane matrix (the
    same numpy default_rng(11) draw stages/dedup.embedding_near_dup
    makes) is inlined as float literals; sign(v . plane) is invariant
    under the engine's positive-norm scaling, so bucketing skips
    normalization; exact cosine within buckets via
    list_cosine_similarity."""
    import numpy as np

    planes = np.random.default_rng(11).standard_normal((dim, n_planes))
    code = " + ".join(
        f"(CASE WHEN list_dot_product(embedding, "
        f"[{', '.join(repr(float(v)) for v in planes[:, i])}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, {code} AS bucket FROM embeddings
        )
        SELECT a.vec_id AS key_a, b2.vec_id AS key_b
        FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        WHERE list_cosine_similarity(a.embedding, b2.embedding) >= {threshold!r}
    """


def oracle_sql() -> dict[str, str]:
    zoom_dims_values = ", ".join(f"({z}, {w}, {h})" for z, (w, h) in ZOOM_DIMS.items())
    from tilecloud_chain_ray.queries import SAMPLE_RATES

    sample_case = " ".join(
        f"WHEN '{lang}' THEN {int(rate * 4294967296)}"
        for lang, rate in SAMPLE_RATES.items()
    )
    knn_sql = """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
            s AS (
                SELECT q.qid AS query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, rank FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
                FROM s
            ) WHERE rank <= 5
        """
    w3, h3 = ZOOM_DIMS[3]
    w2, h2 = ZOOM_DIMS[2]
    span2 = 256 * 20  # z2 span in meters (res 20)
    case_layer = (
        f"CASE WHEN {UY} <= 2147483648 THEN 'north' "
        f"WHEN {UX} < 2147483648 THEN 'west' ELSE 'east' END"
    )
    s_en, s_de, s_fr, s_it = (_score_sql(l) for l in ("en", "de", "fr", "it"))
    return {
        "tile_assign_z3": f"""
            SELECT doc_id,
                   ({UX}) * {w3} // 4294967296 AS tx,
                   ({UY}) * {h3} // 4294967296 AS ty
            FROM documents
        """,
        "tile_counts_per_zoom": f"""
            WITH dims(z, w, h) AS (VALUES {zoom_dims_values}),
            assigned AS (
                SELECT d.z AS z,
                       ({UX}) * d.w // 4294967296 AS tx,
                       ({UY}) * d.h // 4294967296 AS ty
                FROM documents CROSS JOIN dims d
            )
            SELECT z, count(DISTINCT (tx, ty)) AS n_tiles, count(*) AS n_docs
            FROM assigned GROUP BY z
        """,
        "tile_counts_z14": f"""
            WITH zs(z) AS (SELECT * FROM range(0, 15)),
            assigned AS (
                SELECT zs.z AS z,
                       (({UX}) // CAST(power(2, 32 - zs.z) AS BIGINT)) * 4294967296
                     + (({UY}) // CAST(power(2, 32 - zs.z) AS BIGINT)) AS tkey
                FROM documents CROSS JOIN zs
            )
            SELECT z, count(DISTINCT tkey) AS n_tiles, count(*) AS n_docs
            FROM assigned GROUP BY z
        """,
        "cell_counts_r8": f"""
            SELECT ({UX}) // 16777216 AS cell_x,
                   ({UY}) // 16777216 AS cell_y,
                   count(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "pip_layer_counts": f"""
            SELECT {case_layer} AS layer, count(*) AS n
            FROM documents GROUP BY 1
        """,
        "pip_join_rows": f"""
            SELECT 'left' AS mode, doc_id, {case_layer} AS layer FROM documents
            UNION ALL
            SELECT 'inner', doc_id, 'north' FROM documents WHERE {UY} <= 2147483648
            UNION ALL
            SELECT 'inner', doc_id, 'west' FROM documents WHERE {UX} < 2147483648
            UNION ALL
            SELECT 'inner', doc_id, 'east' FROM documents WHERE {UX} >= 2147483648
        """,
        "knn_cosine": knn_sql,
        "dedup_exact": """
            SELECT md5(text) AS content_md5,
                   min(doc_id) AS keep_key,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "lang_pred_counts": f"""
            WITH scores AS (
                SELECT {s_en} AS s_en, {s_de} AS s_de, {s_fr} AS s_fr, {s_it} AS s_it
                FROM documents
            )
            SELECT CASE
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_it THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_it THEN 'de'
                WHEN s_fr >= s_it THEN 'fr'
                ELSE 'it' END AS lang_pred,
                count(*) AS n
            FROM scores GROUP BY 1
        """,
        "token_stats": r"""
            SELECT lang,
                   CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
                   CAST(sum(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))) AS BIGINT) AS sum_bpe_tokens
            FROM documents GROUP BY lang
        """,
        # the whole ExactSubstr chain by gram-STRING equality (the
        # engine's 64-bit rolling fingerprints stand in for it):
        # duplicated 8-grams -> flagged positions -> gaps-and-islands
        # span merge per doc
        "substring_dedup": r"""
            WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(ws[i:i+7], ' ') AS gram
                FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
                WHERE len(ws) >= 8
            ), d AS (
                SELECT gram FROM g GROUP BY gram
                HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2
            ), f AS (
                SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)
            ), m AS (
                SELECT doc_id, pos,
                       MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
                FROM f
            ), isl AS (
                SELECT doc_id, pos,
                       SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos) AS island
                FROM m
            )
            SELECT doc_id, MIN(pos) AS span_start, MAX(pos + 8) AS span_end
            FROM isl GROUP BY doc_id, island
        """,
        "quality_filter_counts": r"""
            WITH m AS (
                SELECT lang,
                       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                       length(text) AS n_chars,
                       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
                FROM documents
            )
            SELECT lang, count(*) AS n_passing FROM m
            WHERE least(n_tokens, 100) / 100.0
                  * (1.0 - n_upper / greatest(n_chars, 1.0)) >= 0.5
            GROUP BY lang
        """,
        "events_tumbling": """
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS window,
                   count(*) AS n,
                   min(value) AS vmin,
                   max(value) AS vmax
            FROM events GROUP BY 1, 2
        """,
        "events_range_join": """
            WITH ranges(lo, hi, week) AS (VALUES
                (1704067200000000, 1704672000000000, 'week0'),
                (1704672000000000, 1705276800000000, 'week1'),
                (1705276800000000, 1705881600000000, 'week2'),
                (1705881600000000, 1706486400000000, 'week3'),
                (1706486400000000, 1707091200000000, 'week4'))
            SELECT r.week, e.event_type, count(*) AS n
            FROM events e JOIN ranges r
              ON epoch_us(e.ts) >= r.lo AND epoch_us(e.ts) < r.hi
            GROUP BY 1, 2
        """,
        "asof_purchase_click": """
            SELECT p.event_id,
                   epoch_us(c.ts) AS prev_click_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts > c.ts
        """,
        "events_sliding": """
            WITH fanout AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS window_start FROM events
                UNION ALL
                SELECT event_type, epoch_us(ts) // 3600000000 - 1 FROM events
            )
            SELECT event_type, window_start, count(*) AS n
            FROM fanout GROUP BY 1, 2
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_topk": """
            SELECT o_orderpriority, o_orderkey, rnk FROM (
                SELECT o_orderpriority, o_orderkey,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                FROM orders
            ) WHERE rnk <= 5
        """,
        "orders_lineitem_join": """
            SELECT o.o_orderpriority, count(*) AS n_lines,
                   sum(l.l_quantity) AS sum_qty
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority
        """,
        "region_customers": """
            SELECT r.r_name, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "anti_join_tiles": f"""
            WITH cached AS (
                SELECT DISTINCT ({UX}) * {w3} // 4294967296 * 1000
                              + ({UY}) * {h3} // 4294967296 AS tkey
                FROM documents WHERE doc_id < 20
            )
            SELECT doc_id FROM documents
            WHERE ({UX}) * {w3} // 4294967296 * 1000
                + ({UY}) * {h3} // 4294967296 NOT IN (SELECT tkey FROM cached)
        """,
        "dimension_cross": f"""
            WITH dates(date) AS (VALUES ('2005'), ('2010'), ('2012'))
            SELECT date, count(*) AS n
            FROM documents CROSS JOIN dates
            GROUP BY date
        """,
        "tile_union_area_z2": f"""
            WITH t AS (
                SELECT DISTINCT ({UX}) * {w2} // 4294967296 AS tx,
                                ({UY}) * {h2} // 4294967296 AS ty
                FROM documents
            )
            SELECT count(*) AS n_tiles,
                   count(*) * {span2}.0 * {span2}.0 AS total_area
            FROM t
        """,
        # S2: sparse metatile enumeration of the point_hash fixture
        # (MultiPoint (600000,200000),(530000,150000) on swissgrid_5,
        # meta 8x8, zooms 0-3 via min_resolution_seed=10).  A point is
        # in metatile (mx,my) at zoom z by plain floor containment;
        # span = 256*8*res.  Mirrors sources/enumerate.sparse_coord_dataset.
        "sparse_metatile_counts": """
            WITH zs(z, span) AS (VALUES (0, 204800), (1, 102400), (2, 40960), (3, 20480)),
            pts(px, py) AS (VALUES (600000.0, 200000.0), (530000.0, 150000.0)),
            hit AS (
                SELECT DISTINCT zs.z,
                       CAST(floor((p.px - 420000.0) / zs.span) AS BIGINT) AS mx,
                       CAST(floor((350000.0 - p.py) / zs.span) AS BIGINT) AS my
                FROM zs CROSS JOIN pts p
            )
            SELECT z, count(*) AS n_metatiles FROM hit GROUP BY z
        """,
        # M2: dense enumeration bounded by the geometry bbox, then the
        # buffered intersect filter (buffer = meta_buffer(128) * res in
        # pixel units, scaled by res again — the reference's px-buffer
        # quirk, __init__.py:2663-2668).  buf column = 128 * res * res.
        "geom_filter_counts": """
            WITH zs(z, span, buf) AS (VALUES
                (0, 204800, 1280000), (1, 102400, 320000),
                (2, 40960, 51200), (3, 20480, 12800)),
            pts(px, py) AS (VALUES (600000.0, 200000.0), (530000.0, 150000.0)),
            bounds AS (SELECT min(px) AS gminx, min(py) AS gminy,
                              max(px) AS gmaxx, max(py) AS gmaxy FROM pts),
            idx(i) AS (SELECT range FROM range(0, 32)),
            cand AS (
                SELECT zs.z AS z, zs.span AS span, zs.buf AS buf,
                       gx.i AS mx, gy.i AS my
                FROM zs CROSS JOIN bounds b CROSS JOIN idx gx CROSS JOIN idx gy
                WHERE gx.i BETWEEN CAST(floor((b.gminx - 420000.0) / zs.span) AS BIGINT)
                               AND CAST(floor((b.gmaxx - 420000.0) / zs.span) AS BIGINT)
                  AND gy.i BETWEEN CAST(floor((350000.0 - b.gmaxy) / zs.span) AS BIGINT)
                               AND CAST(floor((350000.0 - b.gminy) / zs.span) AS BIGINT)
            ),
            hit AS (
                SELECT DISTINCT c.z, c.mx, c.my
                FROM cand c JOIN pts p ON
                     c.mx * c.span - c.buf <= p.px - 420000.0
                 AND p.px - 420000.0 <= (c.mx + 1) * c.span + c.buf
                 AND c.my * c.span - c.buf <= 350000.0 - p.py
                 AND 350000.0 - p.py <= (c.my + 1) * c.span + c.buf
            )
            SELECT z, count(*) AS n_metatiles FROM hit GROUP BY z
        """,
        "vocab_topk": r"""
            SELECT token, n FROM (
                SELECT token, count(*) AS n,
                       row_number() OVER (ORDER BY count(*) DESC, token ASC) AS r
                FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                      FROM documents)
                GROUP BY token
            ) WHERE r <= 50
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {UX} < CASE lang {sample_case} ELSE 0 END
        """,
        "token_quantiles": r"""
            SELECT lang,
                   quantile_disc(n, 0.5) AS p50,
                   quantile_disc(n, 0.9) AS p90,
                   quantile_disc(n, 0.99) AS p99
            FROM (SELECT lang, len(regexp_split_to_array(trim(text), '\s+')) AS n
                  FROM documents)
            GROUP BY lang
        """,
        # word-3-gram shingle strings via a list_transform lambda — the
        # exact string form stages/curation.word_ngrams produces
        "ngram_jaccard_pairs": rf"""
            WITH sh AS (
                SELECT doc_id, {_SHINGLES_SQL} AS sset
                FROM documents WHERE doc_id < 101
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   len(list_intersect(a.sset, b.sset)) * 1.0
                   / (len(a.sset) + len(b.sset)
                      - len(list_intersect(a.sset, b.sset))) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 2 = 0
        """,
        "decontam_counts": rf"""
            WITH sh AS (
                SELECT doc_id, lang, unnest({_SHINGLES_SQL}) AS s
                FROM documents
            ),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5)
            SELECT lang, count(DISTINCT doc_id) AS n_contaminated
            FROM sh WHERE doc_id >= 5 AND s IN (SELECT s FROM bench)
            GROUP BY lang
        """,
        "redaction_stats": r"""
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
                       AS sum_redactions,
                   CAST(sum(CASE WHEN len(regexp_extract_all(text, '[0-9]+')) > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched
            FROM documents GROUP BY lang
        """,
        "knn_ivf_exact": knn_sql,
        "repetition_counts": rf"""
            WITH g AS (
                SELECT lang,
                       CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 3
                       THEN list_transform(
                            generate_series(1, len(regexp_split_to_array(trim(text), '\s+')) - 2),
                            i -> regexp_split_to_array(trim(text), '\s+')[i] || ' '
                              || regexp_split_to_array(trim(text), '\s+')[i+1] || ' '
                              || regexp_split_to_array(trim(text), '\s+')[i+2])
                       ELSE NULL END AS grams
                FROM documents
            )
            SELECT lang, count(*) AS n_repetitive
            FROM g
            WHERE grams IS NOT NULL
              AND 1.0 - len(list_distinct(grams)) * 1.0 / len(grams) > 0.01
            GROUP BY lang
        """,
        "bloom_anti_join": f"""
            WITH cached AS (
                SELECT DISTINCT ({UX}) * {w3} // 4294967296 * 1000
                              + ({UY}) * {h3} // 4294967296 AS tkey
                FROM documents WHERE doc_id < 20
            )
            SELECT doc_id FROM documents
            WHERE ({UX}) * {w3} // 4294967296 * 1000
                + ({UY}) * {h3} // 4294967296 NOT IN (SELECT tkey FROM cached)
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "lang_source_rollup": """
            SELECT lang, source, count(*) AS n
            FROM documents GROUP BY ROLLUP(lang, source)
        """,
        # the full curation chain in one SQL: quality floor, benchmark
        # decontamination, per-lang hash sample, exact dedup (min doc
        # per identical text == min per md5), then the rollup
        "curate_counts": rf"""
            WITH m AS (
                SELECT doc_id, lang, text,
                       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                       length(text) AS n_chars,
                       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
                FROM documents
            ),
            pass AS (
                SELECT doc_id, lang, text, n_tokens FROM m
                WHERE least(n_tokens, 100) / 100.0
                      * (1.0 - n_upper / greatest(n_chars, 1.0)) >= 0.5
                  AND {UX} < CASE lang {sample_case} ELSE 0 END
            ),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
            ),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
            contaminated AS (
                SELECT DISTINCT doc_id FROM sh
                WHERE s IN (SELECT s FROM bench)
            ),
            surv AS (
                SELECT * FROM pass
                WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
                QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
            )
            SELECT lang, count(*) AS n_survivors,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
            FROM surv GROUP BY lang
        """,
        "pack_shards": r"""
            WITH t AS (
                SELECT doc_id, lang,
                       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
                FROM documents
            )
            SELECT doc_id, lang, n_tokens,
                   CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) // 2000 AS BIGINT) AS shard
            FROM t
        """,
        "sessionize": """
            WITH gaps AS (
                SELECT user_id,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > 600000000 THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions
            FROM gaps GROUP BY user_id
        """,
        # res-5 cells: cx = ux // 2^27; ring-2 Chebyshev candidates;
        # exact squared integer micro-distance to the cell center
        # (cx * 2^27 + 2^26); ties break on doc_id — mirrors
        # stages/knn.knn_cell(micro_res=5) operation for operation
        "knn_cell_spatial": f"""
            WITH c AS (
                SELECT doc_id, ({UX}) AS ux, ({UY}) AS uy,
                       ({UX}) // 134217728 AS cx, ({UY}) // 134217728 AS cy
                FROM documents
            ),
            qc AS (
                SELECT cx AS qcx, cy AS qcy FROM (
                    SELECT DISTINCT cx, cy FROM c WHERE doc_id < 10
                    ORDER BY cx, cy LIMIT 3
                )
            ),
            cand AS (
                SELECT qc.qcx, qc.qcy, c.doc_id,
                       c.ux - (qc.qcx * 134217728 + 67108864) AS dx,
                       c.uy - (qc.qcy * 134217728 + 67108864) AS dy
                FROM c JOIN qc
                  ON abs(c.cx - qc.qcx) <= 2 AND abs(c.cy - qc.qcy) <= 2
            )
            SELECT qcx, qcy, doc_id, rnk FROM (
                SELECT qcx, qcy, doc_id,
                       row_number() OVER (
                           PARTITION BY qcx, qcy
                           ORDER BY dx * dx + dy * dy, doc_id) AS rnk
                FROM cand
            ) WHERE rnk <= 5
        """,
        # raster->vector round-trip: per-tile count of distinct
        # non-background pixels at zoom z; pixel = micro // 2^(24 - z)
        # (pixel res z+8), tile = pixel // 256
        "vectorize_pixels": f"""
            WITH zs(z) AS (SELECT * FROM range(0, 5)),
            p AS (
                SELECT DISTINCT zs.z AS z,
                       ({UX}) // CAST(power(2, 24 - zs.z) AS BIGINT) AS px,
                       ({UY}) // CAST(power(2, 24 - zs.z) AS BIGINT) AS py
                FROM documents CROSS JOIN zs
            )
            SELECT z, px // 256 AS x, py // 256 AS y, count(*) AS n_pixels
            FROM p GROUP BY 1, 2, 3
        """,
        # density assembly aggregate: tile = micro // 2^(32 - z)
        "density_tiles": f"""
            WITH zs(z) AS (SELECT * FROM range(0, 5))
            SELECT zs.z AS z,
                   ({UX}) // CAST(power(2, 32 - zs.z) AS BIGINT) AS x,
                   ({UY}) // CAST(power(2, 32 - zs.z) AS BIGINT) AS y,
                   count(*) AS n_points
            FROM documents CROSS JOIN zs
            GROUP BY 1, 2, 3
        """,
        # rolling 8-byte polynomial fingerprint (stages/text.py
        # fingerprint_batch): min over windows of sum(byte[j] * 31^j)
        # mod 2^32.  Exact in SQL for ASCII text >= 8 bytes (the
        # testdata invariant; covered by tests/test_oracle_parity) —
        # unicode(char) == byte value, BIGINT sums never overflow
        # (max ~7.2e12), so % 4294967296 == the numpy uint64 masking.
        "fingerprints": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(generate_series(1, strlen(text)),
                                      i -> CAST(unicode(text[i]) AS BIGINT)) AS bytes
                FROM documents
            ),
            fp AS (
                SELECT doc_id,
                       list_min(list_transform(
                           generate_series(1, len(bytes) - 7),
                           i -> (bytes[i] + bytes[i+1]*31 + bytes[i+2]*961
                               + bytes[i+3]*29791 + bytes[i+4]*923521
                               + bytes[i+5]*28629151 + bytes[i+6]*887503681
                               + bytes[i+7]*27512614111) % 4294967296)) AS fingerprint
                FROM b
            )
            SELECT fingerprint, count(*) AS n_docs FROM fp GROUP BY fingerprint
        """,
        "approx_distinct": _hll_sql(),
        "embed_near_dup": _embed_near_dup_sql(),
        "dedup_minhash": _minhash_sql(),
        "dedup_simhash": _simhash_sql(),
        # reference tests/test_generate.py point_hash goldens: the 8
        # stored (z, row, col) tiles + the run counters
        "generate_point_hash": """
            SELECT * FROM (VALUES
                ('stored:0', 4, 7), ('stored:0', 7, 5),
                ('stored:1', 8, 15), ('stored:1', 14, 11),
                ('stored:2', 21, 39), ('stored:2', 35, 29),
                ('stored:3', 42, 78), ('stored:3', 70, 58),
                ('metatiles_generated', 10, 0), ('metatiles_dropped', 4, 0),
                ('tiles_generated', 384, 0), ('tiles_dropped', 376, 0),
                ('tiles_stored', 8, 0)
            ) t(kind, x, y)
        """,
        # Deterministic synthesized media (functions/png.py, jpeg.py,
        # mp3.py, mp4.py are all from-scratch codecs over fixed
        # content): decode -> resize -> feature aggregate per codec is
        # a constant table, so the oracle is the precomputed golden —
        # same pattern as generate_point_hash above.  png/jpeg
        # feature_mean = mean decoded intensity after the 16x16
        # bilinear resize; mp3/mp4 feature_mean = mean demuxed
        # duration_ms; invariant_ok asserts every decode dimension /
        # demux duration / frame-sample count matched.
        # img_dhash / img_phash: perceptual-hash image near-dup
        # (stages/image_dedup.py) over 32 PNGs + 32 planted resize
        # variants; invariant_ok = pair set EXACTLY the planted set,
        # feature_mean = mean pair hamming distance.
        "media_pipeline": """
            SELECT * FROM (VALUES
                ('png',  CAST(64 AS BIGINT), TRUE, 127.42),
                ('jpeg', CAST(64 AS BIGINT), TRUE, 67.42),
                ('mp3',  CAST(64 AS BIGINT), TRUE, 952.56),
                ('mp4',  CAST(64 AS BIGINT), TRUE, 1239.06),
                ('img_dhash', CAST(64 AS BIGINT), TRUE, 0.94),
                ('img_phash', CAST(64 AS BIGINT), TRUE, 0.81),
                ('audio_fp',  CAST(32 AS BIGINT), TRUE, 0.38)
            ) t(codec, n_media, invariant_ok, feature_mean)
        """,
    }
