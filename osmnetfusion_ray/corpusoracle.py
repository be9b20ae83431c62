"""DuckDB oracle SQL for the corpus fingerprinting / dedup operators.

Every expression here mirrors the engine's numpy arithmetic EXACTLY —
including the uint64 wraparound order (``(x*a) % 2^64 + b) % 2^64 % M``,
not the mathematically-equal ``(x*a+b) % M``) — so the driver's value-hash
compare is bit-equal. The shared primitive is ``fnv1a64`` (FNV-1a over
unicode CODEPOINTS, functions/hashing.py): DuckDB's ``unicode(c)`` yields
the codepoint and HUGEINT holds every intermediate product:

    h*FNV_PRIME   < 2^64 * 2^40  = 2^104
    sh*a (minhash) < 2^61 * 2^61 = 2^122
    bandsum*K1    < 2^63 * 2^64  < 2^127  (HUGEINT max = 2^127-1)

Assumption (asserted by the synth generator): document text is ASCII with
single-space word separators, so codepoints == utf-8 bytes and
``string_split(text,' ')`` == Python ``str.split()``.
"""

from __future__ import annotations

import numpy as np

TWO64 = "18446744073709551616"  # 2^64, parses as HUGEINT
MERSENNE = (1 << 61) - 1        # minhash permutation modulus
POW257_32 = pow(257, 32, 1 << 64)  # rolling-hash window weight

K1 = 0x9E3779B97F4A7C15
K2 = 0xC2B2AE3D27D4EB4F


def fnv_expr(col: str) -> str:
    """Codepoint FNV-1a 64 of a string column/expression, as HUGEINT in
    [0, 2^64). Matches functions/hashing.fnv1a64 bit-for-bit."""
    return f"""
      CASE WHEN length({col}) = 0 THEN 14695981039346656037::HUGEINT
           ELSE list_reduce(
             list_prepend(14695981039346656037::HUGEINT,
                          [unicode(c)::HUGEINT for c in split({col}, '')]),
             (h, b) -> (xor(h, b) * 1099511628211) % {TWO64}::HUGEINT)
      END"""


def _minhash_params_sql(k: int = 64, seed: int = 1234) -> str:
    """The engine's RandomState(seed) permutation params as a VALUES list
    (p, a, b) — numpy-generated constants embedded verbatim."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=k, dtype=np.int64)
    b = rng.randint(0, 1 << 61, size=k, dtype=np.int64)
    rows = ",".join(f"({p},{int(a[p])}::HUGEINT,{int(b[p])}::HUGEINT)" for p in range(k))
    return f"(VALUES {rows})"


# shingles + signatures + LSH buckets + candidate pairs, shared by the
# minhash and ngram oracles (mirrors MinHasher / minhash_candidate_pairs_ds)
def _candidates_cte(k: int = 64, bands: int = 16) -> str:
    rows = k // bands
    assert rows == 4, "band-hash unroll below assumes 4 rows/band"
    return f"""
      params(p, a, b) AS (SELECT * FROM {_minhash_params_sql(k)}),
      words AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS nw
        FROM documents
      ),
      shing AS (
        SELECT doc_id,
               unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                      ELSE [array_to_string(list_slice(ws, i + 1, i + 3), ' ')
                            for i in range(nw - 2)] END) AS s
        FROM words
      ),
      sset AS (SELECT DISTINCT doc_id, s FROM shing),
      hh AS (
        SELECT doc_id, ({fnv_expr('s')}) % 2305843009213693952::HUGEINT AS x
        FROM sset
      ),
      sigs AS (
        SELECT doc_id, p,
               min((((x * a) % {TWO64} + b) % {TWO64}) % {MERSENNE}) AS sig
        FROM hh CROSS JOIN params
        GROUP BY doc_id, p
      ),
      bandsig AS (SELECT doc_id, p // {rows} AS band, p % {rows} AS r, sig FROM sigs),
      bsum AS (
        SELECT doc_id, band, sum(sig) AS s4,
               max(CASE WHEN r = 0 THEN sig END) AS s0,
               max(CASE WHEN r = 1 THEN sig END) AS s1,
               max(CASE WHEN r = 2 THEN sig END) AS s2,
               max(CASE WHEN r = 3 THEN sig END) AS s3
        FROM bandsig GROUP BY doc_id, band
      ),
      bandh AS (
        SELECT doc_id, band,
          xor(xor(xor(xor((s4 * {K1}) % {TWO64},
                          (s0 * {K2}) % {TWO64}),
                          (s1 * {K2 + 1}) % {TWO64}),
                          (s2 * {K2 + 2}) % {TWO64}),
                          (s3 * {K2 + 3}) % {TWO64}) AS bh
        FROM bsum
      ),
      buckets AS (
        SELECT band, bh, doc_id,
               count(*) OVER (PARTITION BY band, bh) AS sz
        FROM bandh
      ),
      pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM buckets x
        JOIN buckets y ON x.band = y.band AND x.bh = y.bh
                       AND x.doc_id < y.doc_id
        WHERE x.sz BETWEEN 2 AND 1000
      )"""


def simhash_sql() -> str:
    return f"""
      WITH toks AS (
        SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ) WHERE tok <> ''
      ),
      th AS (SELECT doc_id, CAST({fnv_expr('tok')} AS UBIGINT) AS h FROM toks),
      bits AS (
        SELECT doc_id, bit,
               CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END AS vote
        FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit)
      ),
      votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY doc_id, bit),
      sh AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit)
                             ELSE 0::HUGEINT END) AS UBIGINT) AS simhash
        FROM votes GROUP BY doc_id
      )
      SELECT d.doc_id, coalesce(sh.simhash, 0::UBIGINT) AS simhash
      FROM documents d LEFT JOIN sh USING (doc_id)
    """


def simhash_near_dups_sql(maxdist: int = 3) -> str:
    """O(n²) self-join ground truth for the banded hamming-ball pairs: the
    engine's 4×16-bit pigeonhole banding has recall 1.0 at maxdist ≤ 3, so
    the two must be bit-equal (pipelines/corpus.py simhash_near_dups)."""
    return f"""
      WITH shv AS ({simhash_sql()})
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM shv a JOIN shv b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {maxdist}
    """


def fingerprints_sql(window: int = 32) -> str:
    """Polynomial rolling hash (base 257 mod 2^64): full-document Horner
    plus min window hash via the prefix closed form
    ``win(j) = (pref(j+w) - pref(j)*257^w) mod 2^64`` — the 128-bit-unsafe
    ``pref*257^w`` product is split 32/32 (hi/lo) so every intermediate
    fits HUGEINT. Mirrors corpus.rolling_fingerprint_batch."""
    pow_lo = POW257_32 % (1 << 32)
    pow_hi = POW257_32 >> 32
    return f"""
      WITH RECURSIVE cps AS (
        SELECT doc_id, [unicode(c)::HUGEINT for c in split(text, '')] AS cs,
               length(text) AS n
        FROM documents
      ),
      chars AS (
        SELECT doc_id, unnest(range(n)) AS p, unnest(cs) AS cp FROM cps
      ),
      pref(doc_id, j, h) AS (
        SELECT doc_id, 0, 0::HUGEINT FROM cps
        UNION ALL
        SELECT p.doc_id, p.j + 1, (p.h * 257 + c.cp) % {TWO64}::HUGEINT
        FROM pref p JOIN chars c ON c.doc_id = p.doc_id AND c.p = p.j
      ),
      full_h AS (
        SELECT c.doc_id, c.n, p.h AS fp
        FROM cps c JOIN pref p ON p.doc_id = c.doc_id AND p.j = c.n
      ),
      wins AS (
        SELECT f.doc_id,
               (pe.h - ((ps.h * {pow_lo}) % {TWO64}
                        + ((ps.h % 4294967296) * {pow_hi}) % 4294967296 * 4294967296)
                        % {TWO64}
                + {TWO64}) % {TWO64} AS w
        FROM full_h f
        JOIN pref ps ON ps.doc_id = f.doc_id AND ps.j <= f.n - {window}
        JOIN pref pe ON pe.doc_id = f.doc_id AND pe.j = ps.j + {window}
        WHERE f.n >= {window}
      ),
      mw AS (SELECT doc_id, min(w) AS minw FROM wins GROUP BY doc_id)
      SELECT f.doc_id, CAST(f.fp AS UBIGINT) AS fingerprint,
             CAST(coalesce(mw.minw, f.fp) AS UBIGINT) AS min_window_h
      FROM full_h f LEFT JOIN mw USING (doc_id)
    """


def minhash_near_dups_sql(threshold: float = 0.6) -> str:
    return f"""
      WITH {_candidates_cte()},
      est AS (
        SELECT p.a, p.b,
               avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END) AS est
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.a
        JOIN sigs sb ON sb.doc_id = p.b AND sb.p = sa.p
        GROUP BY p.a, p.b
      )
      SELECT a, b, est AS jaccard_est FROM est WHERE est >= {threshold!r}
    """


def near_dup_clusters_sql(threshold: float = 0.6) -> str:
    """Mirrors near_dup_clusters: est-filtered minhash pairs → recursive
    min-label connected components → canonical = min doc_id per cluster."""
    return f"""
      WITH {_candidates_cte()},
      est AS (
        SELECT p.a, p.b,
               avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END) AS est
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.a
        JOIN sigs sb ON sb.doc_id = p.b AND sb.p = sa.p
        GROUP BY p.a, p.b
      ),
      nd AS (SELECT a, b FROM est WHERE est >= {threshold!r}),
      sym AS (SELECT a AS s, b AS t FROM nd UNION ALL SELECT b, a FROM nd),
      comp AS (
        WITH RECURSIVE w(node, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.t, w.lab FROM w JOIN sym s ON s.s = w.node
        )
        SELECT node, min(lab) AS label FROM w GROUP BY node
      )
      SELECT node AS doc_id, label AS cluster_rep, node = label AS is_canonical
      FROM comp
    """


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""
      WITH {_candidates_cte()},
      sizes AS (SELECT doc_id, count(*) AS ns FROM sset GROUP BY doc_id),
      inter AS (
        SELECT p.a, p.b, count(*) AS ni
        FROM pairs p
        JOIN sset x ON x.doc_id = p.a
        JOIN sset y ON y.doc_id = p.b AND y.s = x.s
        GROUP BY p.a, p.b
      ),
      jac AS (
        SELECT p.a, p.b,
               CAST(coalesce(i.ni, 0) AS DOUBLE)
                 / greatest(za.ns + zb.ns - coalesce(i.ni, 0), 1) AS j
        FROM pairs p
        JOIN sizes za ON za.doc_id = p.a
        JOIN sizes zb ON zb.doc_id = p.b
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
      )
      SELECT a, b, j AS jaccard FROM jac WHERE j >= {threshold!r}
    """


def _shingle_cte(shingle: int = 3) -> str:
    """words + shing CTE bodies shared by the repetition / contamination
    oracles (same shingle construction as _candidates_cte)."""
    assert shingle == 3
    return """
      words AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS nw
        FROM documents
      ),
      shing AS (
        SELECT doc_id,
               unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                      ELSE [array_to_string(list_slice(ws, i + 1, i + 3), ' ')
                            for i in range(nw - 2)] END) AS s
        FROM words
      )"""


def repetition_stats_sql() -> str:
    """Mirrors repetition_stats_batch: 1 - distinct/total over 3-gram
    occurrences — the division and subtraction are each ONE IEEE op on both
    sides, so no rounding is needed."""
    return f"""
      WITH {_shingle_cte()}
      SELECT doc_id,
             count(*) AS n_shingles,
             count(DISTINCT s) AS n_distinct,
             1.0 - CAST(count(DISTINCT s) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS repetition_ratio
      FROM shing GROUP BY doc_id
    """


def pii_redact_sql() -> str:
    """Mirrors pii_redact_batch — the same RE2 patterns nested in the same
    order (emails, IPs, phones) via regexp_replace(..., 'g')."""
    from .pipelines.corpus import PII_REDACTIONS, PII_RES

    expr = "text"
    for name, token in PII_REDACTIONS:
        # DuckDB '...' literals take backslashes verbatim → pass the RE2
        # pattern through untouched, only quote-escape.
        rx = PII_RES[name].replace("'", "''")
        expr = f"regexp_replace({expr}, '{rx}', '{token}', 'g')"
    return f"""
      SELECT doc_id, {expr} AS text_red, len({expr}) AS n_chars_red
      FROM documents
    """


def pii_counts_sql() -> str:
    """Mirrors pii_counts_batch — DuckDB regexp_* is RE2, same as pyarrow's
    count_substring_regex, so non-overlapping match counts agree exactly."""
    return """
      SELECT doc_id, n_emails, n_ipv4, n_phones, n_digit_runs,
             (n_emails + n_ipv4 + n_phones) > 0 AS has_pii
      FROM (
        SELECT doc_id,
          len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
          len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ipv4,
          len(regexp_extract_all(text, '\\+[0-9]{6,15}')) AS n_phones,
          len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs
        FROM documents
      )
    """


def contamination_sql(test_max_doc_id: int = 10) -> str:
    """Mirrors contamination_flags: n_hits = corpus shingle OCCURRENCES that
    appear in the held-out docs' DISTINCT shingle set."""
    return f"""
      WITH {_shingle_cte()},
      test AS (SELECT DISTINCT s FROM shing WHERE doc_id < {test_max_doc_id}),
      hits AS (
        SELECT c.doc_id, count(*) AS n_hits
        FROM shing c JOIN test t ON c.s = t.s
        WHERE c.doc_id >= {test_max_doc_id}
        GROUP BY c.doc_id
      )
      SELECT d.doc_id,
             coalesce(h.n_hits, 0) AS n_hits,
             coalesce(h.n_hits, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id >= {test_max_doc_id}
    """


def ann_topk_ivf_flat_sql(k: int = 10, query_vec_id: int = 0,
                          n_lists: int = 16, nprobe: int = 4) -> str:
    """Mirror of corpus.ann_topk_ivf_flat: stride-seeded coarse quantizer,
    nearest-list assignment (ties → smaller seed index), nprobe pruning,
    exact cosine re-score in the probed lists. Assumes contiguous vec_ids
    starting at 0 (the corpus table contract)."""
    return f"""
      WITH st AS (SELECT greatest(count(*) // {n_lists}, 1) AS stride FROM embeddings),
      seeds AS (
        SELECT vec_id // (SELECT stride FROM st) AS sidx,
               CAST(embedding AS DOUBLE[]) AS semb
        FROM embeddings
        WHERE vec_id % (SELECT stride FROM st) = 0
          AND vec_id < (SELECT stride FROM st) * {n_lists}
      ),
      q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
            WHERE vec_id = {query_vec_id}),
      probe AS (
        SELECT sidx FROM (
          SELECT sidx, row_number() OVER (
                   ORDER BY list_distance(semb, (SELECT qe FROM q)), sidx) AS rn
          FROM seeds)
        WHERE rn <= {nprobe}
      ),
      assigned AS (
        SELECT vec_id, emb FROM (
          SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, s.sidx,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), s.semb),
                            s.sidx) AS rn
          FROM embeddings e CROSS JOIN seeds s)
        WHERE rn = 1 AND sidx IN (SELECT sidx FROM probe)
      )
      SELECT vec_id,
             round(list_cosine_similarity(emb, (SELECT qe FROM q)), 6) AS sim
      FROM assigned
      ORDER BY list_cosine_similarity(emb, (SELECT qe FROM q)) DESC, vec_id
      LIMIT {k}
    """


def media_feature_stats_sql(dim: int = 16) -> str:
    """Scalar summary of the FeatureExtractor CONTENT histogram — the
    oracle-checkable projection of the list<float> feature column. The
    engine really decodes the payload bytes and histograms the decoded
    units; this mirror recomputes the 16 bin counts from the codec
    generation formulas (ppm/wav/y4m stage docstrings) WITHOUT ever seeing
    bytes, so a match proves encode→decode content-lossless. Bins:
    pixel ``v >> 4`` (image), ``(s + 32768) >> 12`` = raw ``% 65536 //
    4096`` (audio), plane ``v >> 4`` (video). All-integer counts; the only
    float op is one sqrt."""
    return f"""
      WITH bins AS (SELECT unnest(range({dim})) AS bin),
      img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
              FROM documents WHERE doc_id % 3 = 0),
      iy AS (SELECT doc_id, w, h, unnest(range(h)) AS y FROM img),
      ix AS (SELECT doc_id, w, y, unnest(range(w)) AS x FROM iy),
      ic AS (SELECT doc_id, y, x, unnest(range(3)) AS c FROM ix),
      iu AS (SELECT doc_id,
                    ((doc_id*7919 + y*131 + x*31 + c*17) % 256) // 16 AS u
             FROM ic),
      icnt AS (SELECT i.doc_id, b.bin, count(u.u) AS n
               FROM img i CROSS JOIN bins b
               LEFT JOIN iu u ON u.doc_id = i.doc_id AND u.u = b.bin
               GROUP BY 1, 2),
      aud AS (SELECT doc_id, 64 + doc_id % 97 AS ns
              FROM documents WHERE doc_id % 3 = 1),
      at_ AS (SELECT doc_id, unnest(range(ns)) AS t FROM aud),
      au AS (SELECT doc_id,
                    ((doc_id*7919 + t*t*13 + t*101) % 65536) // 4096 AS u
             FROM at_),
      acnt AS (SELECT a.doc_id, b.bin, count(u.u) AS n
               FROM aud a CROSS JOIN bins b
               LEFT JOIN au u ON u.doc_id = a.doc_id AND u.u = b.bin
               GROUP BY 1, 2),
      vid AS (SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                     3 + doc_id % 5 AS nf
              FROM documents WHERE doc_id % 3 = 2),
      vf AS (SELECT doc_id, w, h, unnest(range(nf)) AS f FROM vid),
      vy AS (SELECT doc_id, w, f, unnest(range(h)) AS y FROM vf),
      vx AS (SELECT doc_id, f, y, unnest(range(w)) AS x FROM vy),
      vp AS (SELECT doc_id, f, y, x, unnest(range(3)) AS p FROM vx),
      vu AS (SELECT doc_id,
                    ((doc_id*7919 + f*251 + y*131 + x*31 + p*85) % 256)
                    // 16 AS u
             FROM vp),
      vcnt AS (SELECT v.doc_id, b.bin, count(u.u) AS n
               FROM vid v CROSS JOIN bins b
               LEFT JOIN vu u ON u.doc_id = v.doc_id AND u.u = b.bin
               GROUP BY 1, 2),
      allc AS (
        SELECT doc_id, 'image' AS media_type, bin, n FROM icnt
        UNION ALL SELECT doc_id, 'audio', bin, n FROM acnt
        UNION ALL SELECT doc_id, 'video', bin, n FROM vcnt
      )
      SELECT doc_id AS media_id, media_type,
             CAST(min(n) AS DOUBLE) AS f_min,
             CAST(max(n) AS DOUBLE) AS f_max,
             CAST(sum(n) AS DOUBLE) AS f_sum,
             sqrt(CAST(sum(n * n) AS DOUBLE)) AS f_norm
      FROM allc
      GROUP BY 1, 2
    """


def media_pipeline_sql() -> str:
    """Mirrors stages/multimodal's REAL decode path: payload sizes,
    decoded dims, durations, and nearest-neighbor resize boxes recomputed
    from the codec formats (P6 header = 9 + digits(w) + digits(h) + 3wh
    bytes; canonical WAV = 44 + 2n; Y4M = 33 + digits(w) + digits(h)
    header + nf·(6 + 3wh)) — never from bytes, so a match proves the
    engine's real encode→parse roundtrip."""
    return """
      WITH img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
                   FROM documents WHERE doc_id % 3 = 0),
      aud AS (SELECT doc_id, 64 + doc_id % 97 AS ns
              FROM documents WHERE doc_id % 3 = 1),
      vid AS (SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                     3 + doc_id % 5 AS nf
              FROM documents WHERE doc_id % 3 = 2)
      SELECT doc_id AS media_id, 'image' AS media_type,
             CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                  + 3 * w * h AS BIGINT) AS media_bytes,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(1 AS BIGINT) AS n_frames, 0.0 AS duration_s,
             CAST(least(w, 8) AS BIGINT) AS resized_w,
             CAST(least(h, 8) AS BIGINT) AS resized_h
      FROM img
      UNION ALL
      SELECT doc_id, 'audio',
             CAST(44 + 2 * ns AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(ns AS DOUBLE) / 8000.0,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM aud
      UNION ALL
      SELECT doc_id, 'video',
             CAST(33 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                  + nf * (6 + 3 * w * h) AS BIGINT),
             CAST(w AS BIGINT), CAST(h AS BIGINT), CAST(nf AS BIGINT),
             CAST(nf AS DOUBLE) / 25.0,
             CAST(least(w, 8) AS BIGINT), CAST(least(h, 8) AS BIGINT)
      FROM vid
    """


def extract_text_sql() -> str:
    """Mirror of pipelines.corpus.extract_page_text: rebuild the page html
    with the same template (functions/htmltext.wrap_sql) and run the same
    RE2 extraction chain (extract_sql) — both engines share RE2 semantics,
    so the extracted strings are byte-equal."""
    from .functions.htmltext import extract_sql, wrap_sql

    html = wrap_sql("text", "doc_id::VARCHAR")
    return f"""
      WITH pages AS (
        SELECT doc_id,
               'https://crawl.example/doc/' || doc_id::VARCHAR AS url,
               {html} AS html_s, text
        FROM documents
      )
      SELECT doc_id::BIGINT AS doc_id, url,
             {extract_sql('html_s')} AS extracted,
             {extract_sql('html_s')} = text AS matches,
             length({extract_sql('html_s')})::BIGINT AS ext_chars
      FROM pages
    """


def boilerplate_stats_sql() -> str:
    """Mirror of pipelines.corpus.boilerplate_stats (same template + RE2)."""
    from .functions.htmltext import _BLOCK_PATTERNS, extract_sql, wrap_sql

    html = wrap_sql("text", "doc_id::VARCHAR")
    deblocked = "html_s"
    for pat in _BLOCK_PATTERNS:
        deblocked = f"regexp_replace({deblocked}, '{pat}', '', 'g')"
    return f"""
      WITH pages AS (
        SELECT doc_id, {html} AS html_s FROM documents
      )
      SELECT doc_id::BIGINT AS doc_id,
             length(html_s)::BIGINT AS html_chars,
             len(regexp_extract_all(html_s, '<a\\b[^>]*>'))::BIGINT AS n_links,
             len(regexp_extract_all(html_s, '<[^>]*>'))::BIGINT AS n_tags,
             (length(html_s) - length({deblocked}))::BIGINT AS block_chars,
             length({extract_sql('html_s')})::BIGINT AS text_chars,
             length({extract_sql('html_s')})::DOUBLE
               / (CASE WHEN length(html_s) > 0 THEN length(html_s) ELSE 1 END)::DOUBLE AS text_ratio
      FROM pages
    """


def dup_passages_sql(w: int = 32, s: int = 16) -> str:
    """Mirror of corpus.dup_passages: explode stride-s length-w char
    windows (ASCII text => substring == codepoint slice), codepoint-FNV
    each window, df = distinct docs per hash, per-doc rollup."""
    return f"""
      WITH wins AS (
        SELECT doc_id,
               unnest([substring(text, i*{s} + 1, {w})
                       for i in range((length(text) - {w}) // {s} + 1)]) AS wt
        FROM documents WHERE length(text) >= {w}
      ),
      wh AS (SELECT DISTINCT doc_id, ({fnv_expr('wt')}) AS h FROM wins),
      hd AS (SELECT h, count(*) AS nd FROM wh GROUP BY h)
      SELECT wh.doc_id, count(*) AS n_win,
             CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM wh JOIN hd USING (h)
      GROUP BY wh.doc_id
    """


def train_shuffle_sql() -> str:
    """Mirror of corpus.train_shuffle: global row_number by the
    mirror-padded 'shuf|'-prefixed codepoint-FNV hash of the doc id."""
    key = fnv_expr(
        "'shuf|' || lpad(CAST(doc_id AS VARCHAR), 12, '0')"
        " || reverse(lpad(CAST(doc_id AS VARCHAR), 12, '0'))")
    return f"""
      WITH keyed AS (SELECT doc_id, ({key}) AS h FROM documents)
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
      FROM keyed
    """


def jaccard_prefix_sql(t_num: int = 1, t_den: int = 2) -> str:
    """Mirror of pipelines.corpus.jaccard_prefix_pairs: the same prefix
    filter (df-asc-then-token order, integer ceil prefix length, integer
    length filter) bounds the SQL self-join to prefix tokens — a plain
    all-shared-token self-join would explode on stopword tokens. Prefix
    filtering is lossless, so both sides produce exactly the pairs with
    token-set jaccard ≥ t_num/t_den; the jaccard itself is one
    int→double division on both sides."""
    return f"""
        WITH {_shingle_cte()},
        dt AS (
            SELECT DISTINCT doc_id, s AS tok FROM shing WHERE s <> ''
        ),
        dfq AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
        ranked AS (
            SELECT d.doc_id, d.tok, f.df,
                   row_number() OVER (PARTITION BY d.doc_id
                                      ORDER BY f.df, d.tok) AS rn,
                   count(*) OVER (PARTITION BY d.doc_id) AS L
            FROM dt d JOIN dfq f USING (tok)
        ),
        pref AS (
            SELECT * FROM ranked
            WHERE rn <= L - ((L * {t_num} + {t_den} - 1) // {t_den}) + 1
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM pref x JOIN pref y
              ON x.tok = y.tok AND x.doc_id < y.doc_id
            WHERE {t_den} * least(x.L, y.L) >= {t_num} * greatest(x.L, y.L)
        ),
        sizes AS (SELECT doc_id, count(*) AS L FROM dt GROUP BY doc_id),
        inter AS (
            SELECT c.a, c.b, count(*) AS i
            FROM cand c
            JOIN dt da ON da.doc_id = c.a
            JOIN dt db ON db.doc_id = c.b AND db.tok = da.tok
            GROUP BY c.a, c.b
        )
        SELECT i.a, i.b,
               CAST(i.i AS DOUBLE) / (sa.L + sb.L - i.i) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE {t_den} * i.i >= {t_num} * (sa.L + sb.L - i.i)
    """


# ---------------------------------------------------------------------------
# modular-affine chain-scan oracle helpers (event_chain_scan)
# ---------------------------------------------------------------------------

_M64 = 1 << 64
_M64_SQL = "CAST('18446744073709551616' AS UHUGEINT)"


def mulmod_expr(a: str, b: str) -> str:
    """(a * b) mod 2^64 over UHUGEINT — the 128-bit intermediate of two
    uint64 factors fits uint128 exactly ((2^64-1)^2 < 2^128-1)."""
    return f"((({a}) * ({b})) % {_M64_SQL})"


def powmod_expr(base: int, iexpr: str, bits: int = 40) -> str:
    """base^(iexpr) mod 2^64 as a pure-SQL expression: bit-decomposition
    of the integer exponent column into a chain of ``bits`` conditional
    mulmods over the precomputed squarings base^(2^k) (Python-computed
    literals — both engines share the same constants). Supports exponents
    up to 2^bits - 1; every step reduces mod 2^64 so no intermediate
    exceeds uint128.  The engine side has NO exponent cap, so ``bits``
    must cover the table's row count or the oracle is silently wrong:
    the 40-bit default covers ~1.1e12 rows (beyond any plausible sweep
    scale — the old 24-bit default capped out near sf≈16 on events)."""
    p = base % _M64
    e = "CAST(1 AS UHUGEINT)"
    for k in range(bits):
        term = (f"(CASE WHEN ((({iexpr}) >> {k}) & 1) = 1 "
                f"THEN CAST('{p}' AS UHUGEINT) ELSE CAST(1 AS UHUGEINT) END)")
        e = mulmod_expr(e, term)
        p = (p * p) % _M64
    return e
