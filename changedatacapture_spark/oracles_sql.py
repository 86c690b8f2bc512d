"""DuckDB oracle SQL twins for ``queries.QUERIES`` — the driver's
correctness gate runs these side-by-side with the Spark queries at sf=0.01
(row-count + schema + order-insensitive value-hash).

Determinism rules shared with queries.py:
- timestamps → epoch micros BIGINT; floats → integer micro/cent units;
- all hashing is md5 hex (identical across engines), never engine hashes;
- double arithmetic is written with the same operation order as the Spark
  expression so IEEE results are bit-identical.

Round 3: EVERY queries() entry has a twin — including the embedding stage,
whose stub was redefined over md5 arithmetic precisely so its float32
vectors are reproducible in ANSI SQL (_embed_sql). The LSH/IVF-ANN twins
inline their deterministic hyperplanes as double literals and reuse the
proven list_dot_product fold parity (ann_cosine_topk).
"""

_ENV = """
    SELECT
      'https://site-' || CAST(user_id % 50 AS VARCHAR) || '.example.com/page/'
        || lpad(CAST(user_id AS VARCHAR), 6, '0')        AS url,
      CASE WHEN event_type = 'signup' THEN 'c'
           WHEN event_type = 'error'  THEN 'd'
           ELSE 'u' END                                  AS op,
      epoch_us(ts)                                       AS warc_us,
      event_id                                           AS pos,
      CAST(round(value * 100) AS BIGINT)                 AS val_cents
    FROM events
"""

_WINNERS = f"""
    WITH env AS ({_ENV}),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
      FROM env
    )
    SELECT url, op, warc_us, pos, val_cents FROM r WHERE rn = 1
"""

# the engine's derived sectioned corpus (must match queries._SECTIONED)
_SECTIONED = (
    "'1. ' || substr(text, 1, 24) || chr(10) || substr(text, 25, 100) || chr(10) || "
    "'## ' || substr(text, 125, 16) || chr(10) || substr(text, 141, 10000)"
)


def _linediff_new_sql() -> str:
    """The line-diff 'new text' template shared verbatim with queries.py."""
    from .queries import _LINEDIFF_NEW

    return _LINEDIFF_NEW.format(t="text", vc="VARCHAR")


_LINEDIFF_NEW = _linediff_new_sql()

_HEAD_RE = r"^(#+|[0-9]+\.)\s+(.+?)$"

# independent SQL reimplementation of the reference chunker
# (/root/reference/main.py:105-159) — validates the pandas-UDF port
# byte-for-byte including the end_index quirk (see oracle.chunk_by_sections)
_CHUNKS = f"""
    WITH s AS (
      SELECT doc_id, {_SECTIONED} AS stext FROM documents
    ),
    lines AS (
      SELECT doc_id, stext,
             unnest(string_split(stext, chr(10))) AS line,
             unnest(range(1, len(string_split(stext, chr(10))) + 1)) AS ln
      FROM s
    ),
    pos AS (
      SELECT *,
        coalesce(sum(length(line) + 1) OVER (PARTITION BY doc_id ORDER BY ln
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_start,
        regexp_matches(line, '{_HEAD_RE}') AS is_head
      FROM lines
    ),
    sec AS (
      SELECT *, sum(CASE WHEN is_head THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY ln) AS sec_id
      FROM pos
    ),
    grp AS (
      SELECT doc_id, sec_id,
        any_value(length(stext)) AS text_len,
        min(line_start) AS start_index,
        string_agg(line, chr(10) ORDER BY ln) AS joined,
        max(CASE WHEN is_head THEN regexp_extract(line, '{_HEAD_RE}', 2) END) AS section_title,
        max(CASE WHEN is_head THEN length(line) END) AS head_len
      FROM sec
      WHERE sec_id >= 1
      GROUP BY doc_id, sec_id
    ),
    fin AS (
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sec_id) - 1 AS INT) AS chunk_index,
        section_title,
        trim(joined, ' ' || chr(9) || chr(10) || chr(13)) AS content,
        CAST(start_index AS INT) AS start_index,
        CAST(coalesce(
          lead(start_index) OVER (PARTITION BY doc_id ORDER BY sec_id)
            - (lead(head_len) OVER (PARTITION BY doc_id ORDER BY sec_id) + 1),
          text_len) AS INT) AS end_index
      FROM grp
    )
    SELECT doc_id, chunk_index, section_title, content,
           CAST(length(content) AS INT) AS chunk_size, start_index, end_index
    FROM fin
"""

_DUP_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""

_SHINGLES = f"""
    WITH corpus AS ({_DUP_CORPUS}),
    words AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words WHERE len(w) >= 3)
    )
"""

def _bands_sql(bands: int = 4, rows_per_band: int = 4) -> str:
    """Mirror of functions.dedup minhash/LSH: ONE md5 per shingle → 32-bit
    int (hex prefix) → arithmetic permutations (a_i·h+b_i mod 2^61-1) shared
    verbatim via minhash_perm_consts — BIGINT-safe in both engines."""
    from .functions.dedup import MINHASH_P, minhash_perm_consts

    n = bands * rows_per_band
    a, b = minhash_perm_consts(n)
    mins = ",\n          ".join(
        f"min(({a[i]} * h + {b[i]}) % {MINHASH_P}) AS m{i}" for i in range(n)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {bd} AS band, md5(concat_ws('|', {cols})) AS bkey FROM sig".format(
            bd=bd,
            cols=", ".join(
                f"CAST(m{bd * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
            ),
        )
        for bd in range(bands)
    )
    return f"""
    {_SHINGLES},
    hv AS (
      SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
          {mins}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
"""


_BANDS = _bands_sql()

_SIMHASH_VOTES = ", ".join(
    f"sum(CASE WHEN substr(h, {p + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
    f"THEN 1 ELSE -1 END) AS v{p}"
    for p in range(16)
)
_SIMHASH_PACK = " + ".join(f"(CASE WHEN v{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(16))

_QUALITY = """
    SELECT doc_id,
      CAST(round((
        0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE))
        + 0.3 * least(1.0, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0)
        + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE))
      ) * 1000000) AS BIGINT) AS quality_micro
    FROM documents
"""

_LANG_WORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "vi": ["và", "của", "là", "cho", "các"],
    "zh": ["的", "是", "了", "在", "我"],
}
_LANG_SCORE_COLS = ", ".join(
    "("
    + " + ".join(f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in words)
    + f") AS score_{lang}"
    for lang, words in _LANG_WORDS.items()
)

def _lsh_topk_sql(dim: int = 64, n_planes: int = 8) -> str:
    """DuckDB twin of queries.ann_lsh_topk: the Philox hyperplanes inlined as
    double literals (repr round-trips IEEE doubles; explicit DOUBLE[] cast
    avoids DuckDB's decimal-literal default). Bucket + ranking folds reuse
    list_dot_product, whose order parity with Spark's zip_with/aggregate fold
    is proven by the green ann_cosine_topk row."""
    from .functions.similarity import _projection_matrix

    planes = _projection_matrix(dim, n_planes)

    def arr(row) -> str:
        return "CAST([" + ", ".join(repr(float(x)) for x in row) + "] AS DOUBLE[])"

    def bucket_of(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {arr(planes[p])}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )

    return f"""
        WITH q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
        ),
        qq AS (
          SELECT qe, sqrt(list_dot_product(qe, qe)) AS qn,
                 {bucket_of('qe')} AS qbucket
          FROM q
        ),
        b AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 {bucket_of('CAST(embedding AS DOUBLE[])')} AS bucket
          FROM embeddings
        )
        SELECT vec_id,
               CAST(round(list_dot_product(e, qq.qe)
                          / (sqrt(list_dot_product(e, e)) * qq.qn) * 1000000)
                    AS BIGINT) AS cos_micro
        FROM b, qq
        WHERE b.bucket = qq.qbucket
        ORDER BY cos_micro DESC, vec_id ASC
        LIMIT 10
    """


def _incr_ann_sql(dim: int = 64, n_planes: int = 4, n_updates: int = 10) -> str:
    """DuckDB twin of queries.ann_incremental_topk: the POST-update corpus
    (vec_ids < n_updates negated — exactly the CDC epoch the engine applied
    to its incremental index) restricted to the ORIGINAL query vector's LSH
    bucket, exact-cosine top-10. The engine's merge-on-read index must
    deliver this with no rebuild: a stale pre-update vector surviving in the
    probed bucket would surface as a cos=1.0 self-match and hash-mismatch."""
    from .functions.similarity import _projection_matrix

    planes = _projection_matrix(dim, n_planes)

    def arr(row) -> str:
        return "CAST([" + ", ".join(repr(float(x)) for x in row) + "] AS DOUBLE[])"

    def bucket_of(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {arr(planes[p])}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )

    return f"""
        WITH cur AS (
          SELECT vec_id,
                 CASE WHEN vec_id < {n_updates}
                      THEN list_transform(CAST(embedding AS DOUBLE[]), x -> -x)
                      ELSE CAST(embedding AS DOUBLE[]) END AS e
          FROM embeddings
        ),
        q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
        ),
        qq AS (
          SELECT qe, sqrt(list_dot_product(qe, qe)) AS qn,
                 {bucket_of('qe')} AS qbucket
          FROM q
        ),
        b AS (SELECT vec_id, e, {bucket_of('e')} AS bucket FROM cur)
        SELECT CAST(vec_id AS VARCHAR) AS chunk_id,
               CAST(round(list_dot_product(e, qq.qe)
                          / (sqrt(list_dot_product(e, e)) * qq.qn) * 1000000)
                    AS BIGINT) AS cos_micro
        FROM b, qq
        WHERE b.bucket = qq.qbucket
        ORDER BY cos_micro DESC, chunk_id ASC
        LIMIT 10
    """


def _raw_embed_expr(dim: int = 384) -> str:
    """The md5-arithmetic raw-vector expression over a ``base`` column
    (= md5 of the embedded text) — shared by every twin that recomputes
    stub embeddings (see ``_embed_sql`` for the full derivation notes)."""
    return f"""
        list_transform(range({dim}), i ->
          CAST((('0x' || substr(md5(base || chr(31) || CAST((i // 2) AS VARCHAR)),
                                1 + 16 * (i % 2), 15))::BIGINT % 2000001)
               - 1000000 AS DOUBLE))
    """


def _embed_sql(dim: int = 384) -> str:
    """DuckDB twin of queries.embed_documents: the md5-arithmetic embedding
    stub reproduced end to end. base = md5(text) hex, hashed once; dim pair
    j then comes from h = md5(base · chr(31) · j), split into two 15-hex
    slices — python ``h[0:15]`` ↔ ``substr(h, 1, 15)`` and python
    ``h[16:31]`` ↔ ``substr(h, 17, 15)`` — converted via the
    ``('0x'||slice)::BIGINT`` hex→int rule and mapped to [-10^6, 10^6].
    The norm is sqrt over EXACT integer squares (< 2^53 — bit-equal in any
    summation order), the normalized values are cast to FLOAT exactly like
    Spark's array<float> storage, and the projection (dim, norm_micro, md5
    of the micro-unit ints) matches the Spark side byte for byte."""
    raw = _raw_embed_expr(dim)
    return f"""
        WITH d AS (
          SELECT doc_id, md5(text) AS base FROM documents ORDER BY doc_id LIMIT 50
        ),
        r AS (SELECT doc_id, {raw} AS raw FROM d),
        n AS (SELECT doc_id, raw, sqrt(list_dot_product(raw, raw)) AS nrm FROM r),
        v AS (
          SELECT doc_id,
                 list_transform(raw, x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE)) AS e
          FROM n
        )
        SELECT doc_id,
               CAST({dim} AS INTEGER) AS dim,
               CAST(round(sqrt(list_dot_product(e, e)) * 1000000) AS BIGINT) AS norm_micro,
               md5(array_to_string(
                 list_transform(e, x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)),
                 ',')) AS vec_md5
        FROM v
    """


ORACLE_SQL: dict[str, str] = {
    "cdc_envelope": _ENV,
    "cdc_lww_winners": _WINNERS,
    "cdc_final_state": f"""
        WITH w AS ({_WINNERS})
        SELECT url, op AS last_op, warc_us, pos, val_cents FROM w WHERE op <> 'd'
    """,
    "cdc_op_counts": f"WITH env AS ({_ENV}) SELECT op, count(*) AS n FROM env GROUP BY op",
    "cdc_dedup_deliveries": f"""
        SELECT DISTINCT * FROM (
          SELECT * FROM ({_ENV}) UNION ALL SELECT * FROM ({_ENV})
        )
    """,
    "cdc_changelog_recent": f"""
        WITH env AS ({_ENV})
        SELECT * FROM env ORDER BY warc_us DESC, pos DESC LIMIT 100
    """,
    "cdc_point_read": f"WITH env AS ({_ENV}) SELECT * FROM env WHERE pos = 123",
    # the Spark side answers this through the lake's bloom-pruned read_keys
    # path; the oracle is the plain fold restricted to the same probed urls
    # (queries._LAKE_PROBE_UIDS) — identical output proves the pruned
    # physical read is lossless
    "cdc_lake_point_read": f"""
        WITH w AS ({_WINNERS})
        SELECT url, op AS last_op, warc_us, pos, val_cents FROM w
        WHERE op <> 'd' AND url IN (
          'https://site-7.example.com/page/000007',
          'https://site-23.example.com/page/000023',
          'https://site-42.example.com/page/000042'
        )
    """,
    # event-time tail: winners strictly above the pos=700 event's
    # (warc_us, pos) — the engine answers via order-key-pruned read_since;
    # k0 is constant (the envelope has no snapshot 'r' ops), so the SQL
    # order reduces to (warc_us, pos)
    "cdc_read_since": f"""
        WITH w AS ({_WINNERS}),
        h AS (SELECT warc_us AS h_us FROM ({_ENV}) WHERE pos = 700)
        SELECT
          url,
          CASE WHEN op = 'd' THEN 'delete' ELSE 'upsert' END AS change_type,
          op AS last_op, warc_us, pos, val_cents
        FROM w, h
        WHERE w.warc_us > h.h_us OR (w.warc_us = h.h_us AND w.pos > 700)
    """,
    # snapshot-window change feed: fold(even-pos half) is the base state,
    # fold(odd-pos half) the window; classification + no-op suppression
    # mirror LakeTable.read_changes exactly (late replays lose the
    # effectiveness predicate; deletes of non-live keys vanish)
    "cdc_changes_feed": f"""
        WITH env AS ({_ENV}),
        pre AS (
          SELECT url, op, warc_us, pos FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 4 IN (0, 2)
          ) WHERE rn = 1
        ),
        win AS (
          SELECT url, op, warc_us, pos, val_cents FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 4 IN (1, 3)
          ) WHERE rn = 1
        )
        SELECT
          w.url,
          CASE WHEN w.op = 'd' THEN 'delete'
               WHEN p.op IS NOT NULL AND p.op <> 'd' THEN 'update'
               ELSE 'insert' END AS change_type,
          w.op AS last_op, w.warc_us, w.pos, w.val_cents
        FROM win w LEFT JOIN pre p USING (url)
        WHERE (p.warc_us IS NULL
               OR w.warc_us > p.warc_us
               OR (w.warc_us = p.warc_us AND w.pos > p.pos))
          AND NOT (w.op = 'd' AND (p.op IS NULL OR p.op = 'd'))
    """,
    # round 6: member-granular SET-mode change feed — base = fold of the
    # pos%4∈{0,1} half, window = fold of the {2,3} half; each non-delete
    # winner expands to abs(val_cents)%3+1 members whose content encodes
    # the value; the member diff (insert/update/delete, unchanged
    # suppressed) mirrors LakeTable._changes_set exactly, with delete rows
    # carrying the OLD member's content under the window event's order.
    # commit_off = which window commit won (pos%4==2 → epoch 2 → 1; ==3 → 2)
    "cdc_chunk_changes": f"""
        WITH env AS ({_ENV}),
        pre AS (
          SELECT url, op, warc_us, pos, val_cents FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 4 IN (0, 1)
          ) WHERE rn = 1
        ),
        win AS (
          SELECT url, op, warc_us, pos, val_cents FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 4 IN (2, 3)
          ) WHERE rn = 1
        ),
        eff AS (
          SELECT w.url, w.op, w.warc_us, w.pos, w.val_cents,
                 p.op AS p_op, p.val_cents AS p_val
          FROM win w LEFT JOIN pre p USING (url)
          WHERE p.warc_us IS NULL
             OR w.warc_us > p.warc_us
             OR (w.warc_us = p.warc_us AND w.pos > p.pos)
        ),
        nm0 AS (
          SELECT url, unnest(range(abs(val_cents) % 3 + 1)) AS ci, val_cents
          FROM eff WHERE op <> 'd'
        ),
        nm AS (
          SELECT url, CAST(ci AS INT) AS chunk_index,
                 url || ':' || CAST(val_cents AS VARCHAR) || ':'
                     || CAST(ci AS VARCHAR) AS content
          FROM nm0
        ),
        om0 AS (
          SELECT url, unnest(range(abs(p_val) % 3 + 1)) AS ci, p_val
          FROM eff WHERE p_op IS NOT NULL AND p_op <> 'd'
        ),
        om AS (
          SELECT url, CAST(ci AS INT) AS chunk_index,
                 url || ':' || CAST(p_val AS VARCHAR) || ':'
                     || CAST(ci AS VARCHAR) AS content
          FROM om0
        ),
        fo AS (
          SELECT COALESCE(n.url, o.url) AS url,
                 COALESCE(n.chunk_index, o.chunk_index) AS chunk_index,
                 n.content AS n_content, o.content AS o_content
          FROM nm n FULL OUTER JOIN om o
            ON n.url = o.url AND n.chunk_index = o.chunk_index
        )
        SELECT f.url, f.chunk_index,
               CASE WHEN f.n_content IS NULL THEN 'delete'
                    WHEN f.o_content IS NULL THEN 'insert'
                    ELSE 'update' END AS change_type,
               CASE WHEN f.n_content IS NULL THEN f.o_content
                    ELSE f.n_content END AS content,
               e.op AS last_op, e.warc_us, e.pos,
               CAST(CASE WHEN e.pos % 4 = 2 THEN 1 ELSE 2 END AS BIGINT)
                 AS commit_off
        FROM fo f JOIN eff e USING (url)
        WHERE f.n_content IS NULL OR f.o_content IS NULL
           OR f.n_content <> f.o_content
    """,
    # round 6: replace-window change feed — the window holds an append
    # commit (pos%4==1 half, LWW-merged) AND a replace_keys rewrite planned
    # on the base state (abs(val_cents)%5==0 → val_cents+100000 at the
    # UNCHANGED order key; %5==1 → deleted). A rewrite is not LWW-ordered,
    # so the engine serves the window as a STATE DIFF; the oracle rebuilds
    # both states (LWW fold + the same rewrite algebra) and diffs them:
    # delete rows carry the OLD payload, identical rows are suppressed,
    # commit_off = 2 (the window's end — a rewrite has no per-row commit)
    "cdc_replace_feed": f"""
        WITH env AS ({_ENV}),
        pre AS (
          SELECT url, op, warc_us, pos, val_cents FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 2 = 0
          ) WHERE rn = 1
        ),
        prelive AS (SELECT * FROM pre WHERE op <> 'd'),
        mid AS (
          SELECT url, op, warc_us, pos, val_cents FROM (
            SELECT *, row_number() OVER (
              PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
            FROM env WHERE pos % 2 = 0 OR pos % 4 = 1
          ) WHERE rn = 1
        ),
        midlive AS (SELECT * FROM mid WHERE op <> 'd'),
        a AS (
          SELECT url, op, warc_us, pos,
                 CAST(val_cents + 100000 AS BIGINT) AS val_cents
          FROM prelive WHERE abs(val_cents) % 5 = 0
        ),
        touched AS (
          SELECT url FROM a
          UNION SELECT url FROM prelive WHERE abs(val_cents) % 5 = 1
        ),
        post AS (
          SELECT * FROM midlive WHERE url NOT IN (SELECT url FROM touched)
          UNION ALL SELECT * FROM a
        ),
        fo AS (
          SELECT COALESCE(n.url, o.url) AS url,
                 n.url IS NOT NULL AS has_n, o.url IS NOT NULL AS has_o,
                 n.op AS n_op, n.warc_us AS n_us,
                 n.pos AS n_pos, n.val_cents AS n_val,
                 o.op AS o_op, o.warc_us AS o_us,
                 o.pos AS o_pos, o.val_cents AS o_val
          FROM post n FULL OUTER JOIN prelive o ON n.url = o.url
        )
        SELECT url,
               CASE WHEN NOT has_n THEN 'delete'
                    WHEN NOT has_o THEN 'insert'
                    ELSE 'update' END AS change_type,
               CASE WHEN NOT has_n THEN o_op ELSE n_op END AS last_op,
               CASE WHEN NOT has_n THEN o_us ELSE n_us END AS warc_us,
               CASE WHEN NOT has_n THEN o_pos ELSE n_pos END AS pos,
               CASE WHEN NOT has_n THEN o_val ELSE n_val END AS val_cents,
               CAST(2 AS BIGINT) AS commit_off
        FROM fo
        WHERE NOT has_n OR NOT has_o
           OR n_op IS DISTINCT FROM o_op
           OR n_us IS DISTINCT FROM o_us
           OR n_pos IS DISTINCT FROM o_pos
           OR n_val IS DISTINCT FROM o_val
    """,
    # feed-driven mirror: a table maintained ONLY by applying read_changes
    # windows (per-epoch polls + a compact-only window) must equal the plain
    # LWW fold's live winners; src_diff is the engine's distributed
    # exceptAll-both-ways count vs the source (0 on equality)
    "cdc_mirror_state": f"""
        WITH w AS ({_WINNERS})
        SELECT url, op AS last_op, warc_us, pos, val_cents,
               CAST(0 AS BIGINT) AS src_diff
        FROM w WHERE op <> 'd'
    """,
    # feed-driven vector index: the mirror's INDEX content after a window
    # of updates (new chunk_id per edited doc — the old id dies via the
    # feed's _old preimage) and deletes must equal the expected final
    # corpus re-embedded from scratch, every float32 byte (the Pinecone
    # state after the reference's updater loop)
    "cdc_vector_mirror": f"""
        WITH d0 AS (
          SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 40
        ),
        fin AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN text || ' v2' ELSE text END
                   AS content
          FROM d0 WHERE doc_id % 4 <> 1
        ),
        c AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS url,
                 md5('doc-' || CAST(doc_id AS VARCHAR) || ':' || content)
                   AS chunk_id,
                 md5(content) AS base
          FROM fin
        ),
        r AS (SELECT url, chunk_id, {_raw_embed_expr()} AS raw FROM c),
        n AS (
          SELECT url, chunk_id, raw,
                 sqrt(list_dot_product(raw, raw)) AS nrm
          FROM r
        ),
        v AS (
          SELECT url, chunk_id,
                 list_transform(raw, x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE))
                   AS e
          FROM n
        )
        SELECT url, chunk_id,
               CAST(384 AS INTEGER) AS dim,
               CAST(round(sqrt(list_dot_product(e, e)) * 1000000) AS BIGINT)
                 AS norm_micro,
               md5(array_to_string(
                 list_transform(e, x -> CAST(CAST(round(x * 1000000) AS BIGINT)
                                             AS VARCHAR)), ',')) AS vec_md5,
               CAST(0 AS BIGINT) AS src_diff
        FROM v
    """,
    "cdc_range_slice": f"WITH env AS ({_ENV}) SELECT * FROM env WHERE pos BETWEEN 1000 AND 1100",
    # truncate-then-rebuild: the engine's snapshot horizon (op='t') must
    # equal the LWW fold over only the events strictly above the horizon
    "cdc_truncate_state": f"""
        WITH env AS ({_ENV}),
        h AS (SELECT warc_us AS h_us, pos AS h_pos FROM env WHERE pos = 500),
        f AS (
          SELECT env.* FROM env, h
          WHERE env.warc_us > h.h_us OR (env.warc_us = h.h_us AND env.pos > h.h_pos)
        ),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
          FROM f
        )
        SELECT url, op AS last_op, warc_us, pos, val_cents
        FROM r WHERE rn = 1 AND op <> 'd'
    """,
    # round 5: typed evolved-column promotion — the winner projection with
    # the same poison rule the Spark side used; x_views re-widened to
    # VARCHAR (epoch 1 brought 'v###'), x_rank stays BIGINT (every value
    # numeric → logical type over string-physical parquet)
    "cdc_evolved_state": f"""
        WITH w AS ({_WINNERS})
        SELECT url, pos,
               CASE WHEN pos % 97 = 0 THEN 'v' || CAST(val_cents AS VARCHAR)
                    ELSE CAST(val_cents AS VARCHAR) END AS x_views,
               CAST(val_cents AS BIGINT)                AS x_rank
        FROM w WHERE op <> 'd'
    """,
    # round 5: corrupt-row dead-lettering — every pos%13==0 feed line was
    # poisoned; quarantine/lineage/live counts recomputed from the same
    # predicate over the events table
    "cdc_quarantine": f"""
        WITH env AS ({_ENV}),
        good AS (SELECT * FROM env WHERE pos % 13 <> 0),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_us DESC, pos DESC) AS rn
          FROM good
        )
        SELECT
          CAST((SELECT count(*) FROM good) AS BIGINT)                  AS n_applied,
          CAST((SELECT count(*) FROM env WHERE pos % 13 = 0) AS BIGINT) AS n_corrupt,
          CAST((SELECT count(*) FROM env WHERE pos % 13 = 0) AS BIGINT) AS n_quarantined,
          CAST((SELECT count(*) FROM r WHERE rn = 1 AND op <> 'd') AS BIGINT) AS n_live
    """,
    "cdc_lineage_by_segment": f"""
        WITH env AS ({_ENV})
        SELECT CAST(floor(pos / 1000) AS BIGINT) AS segment,
               count(*) AS rows_in, min(pos) AS min_pos, max(pos) AS max_pos,
               count(DISTINCT url) AS n_urls
        FROM env GROUP BY 1
    """,
    "cdc_noop_updates": f"""
        WITH env AS ({_ENV}),
        l AS (
          SELECT *, lag(val_cents) OVER (PARTITION BY url ORDER BY warc_us, pos) AS prev
          FROM env
        )
        SELECT url, pos, val_cents FROM l WHERE op = 'u' AND prev = val_cents
    """,
    "cdc_events_per_hour": f"""
        WITH env AS ({_ENV})
        SELECT CAST(warc_us // 3600000000 AS BIGINT) AS hour_bucket, op,
               count(*) AS n_events, count(DISTINCT url) AS n_urls
        FROM env GROUP BY 1, 2
    """,
    "cdc_site_activity": f"""
        WITH env AS ({_ENV})
        SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS site,
               count(*) AS n_events
        FROM env GROUP BY 1
    """,
    "cdc_asof_probe": f"""
        WITH env AS ({_ENV}),
        dels AS (SELECT url, warc_us, pos FROM env WHERE op = 'd'),
        ups AS (
          SELECT url, warc_us, arg_max(val_cents, pos) AS val_cents
          FROM env WHERE op <> 'd' GROUP BY url, warc_us
        )
        SELECT d.url, d.warc_us, d.pos,
               u.val_cents AS asof_val_cents, u.warc_us AS asof_warc_us
        FROM dels d ASOF LEFT JOIN ups u
          ON d.url = u.url AND d.warc_us >= u.warc_us
    """,
    "events_in_windows": f"""
        WITH env AS ({_ENV}),
        iv AS (
          SELECT pos AS interval_id, warc_us AS lo, warc_us + 3600000000 AS hi
          FROM env WHERE pos % 500 = 0
        )
        SELECT i.interval_id, count(*) AS n_events, count(DISTINCT e.url) AS n_urls
        FROM env e JOIN iv i ON e.warc_us BETWEEN i.lo AND i.hi
        GROUP BY 1
    """,
    "cdc_sessions": f"""
        WITH env AS ({_ENV}),
        l AS (
          SELECT url, warc_us, pos,
                 lag(warc_us) OVER (PARTITION BY url ORDER BY warc_us, pos) AS prev
          FROM env
        ),
        marked AS (
          SELECT url, warc_us, pos,
                 CASE WHEN prev IS NULL OR warc_us - prev > {30 * 60 * 1_000_000}
                      THEN 1 ELSE 0 END AS is_new
          FROM l
        ),
        sess AS (
          SELECT url, warc_us,
                 sum(is_new) OVER (PARTITION BY url ORDER BY warc_us, pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked
        )
        SELECT url, CAST(session_id AS BIGINT) AS session_id,
               min(warc_us) AS session_start_us,
               max(warc_us) AS session_end_us,
               count(*) AS n_events
        FROM sess GROUP BY url, session_id
    """,
    "cdc_hot_urls": f"""
        WITH env AS ({_ENV})
        SELECT url, count(*) AS n FROM env GROUP BY url
        HAVING count(*) * 100 > (SELECT count(*) FROM env)
    """,
    "doc_chunks": _CHUNKS,
    "doc_chunk_previews": f"""
        WITH ch AS ({_CHUNKS})
        SELECT doc_id, chunk_index,
               substr(content, 1, 500) AS content_preview,
               CAST(length(content) AS INT) AS full_len
        FROM ch
    """,
    "doc_line_diff": f"""
        WITH pair AS (
          SELECT doc_id, {_SECTIONED} AS old_text,
                 {_LINEDIFF_NEW} AS new_text
          FROM documents
        ),
        o AS (
          SELECT doc_id,
                 unnest(string_split(old_text, chr(10))) AS old_line,
                 CAST(unnest(range(0, len(string_split(old_text, chr(10))))) AS INT) AS line
          FROM pair
        ),
        n AS (
          SELECT doc_id,
                 unnest(string_split(new_text, chr(10))) AS new_line,
                 CAST(unnest(range(0, len(string_split(new_text, chr(10))))) AS INT) AS line
          FROM pair
        ),
        j AS (
          SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 coalesce(o.line, n.line) AS line, old_line, new_line
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id AND o.line = n.line
        )
        SELECT doc_id,
               CASE WHEN old_line IS NULL THEN 'added'
                    WHEN new_line IS NULL THEN 'deleted'
                    WHEN old_line <> new_line THEN 'modified' END AS change_type,
               line, old_line, new_line
        FROM j
        WHERE old_line IS NULL OR new_line IS NULL OR old_line <> new_line
    """,
    "doc_chunk_stats": f"""
        WITH ch AS ({_CHUNKS})
        SELECT count(DISTINCT doc_id) AS total_documents,
               count(*) AS total_chunks,
               -- DuckDB sum(INT) is HUGEINT (int128); Spark's is BIGINT — the
               -- driver's value-hash is type-sensitive, so cast to match
               CAST(sum(chunk_size) AS BIGINT) AS sum_chunk_size,
               CAST((sum(chunk_size) * 1000000) // count(*) AS BIGINT) AS avg_chunk_size_micro
        FROM ch
    """,
    "doc_token_counts": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS token_count
        FROM documents
    """,
    "doc_quality": _QUALITY,
    "doc_fingerprints": """
        SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    "doc_lang_scores": f"SELECT doc_id, {_LANG_SCORE_COLS} FROM documents",
    "corpus_prep": """
        WITH scored AS (
          SELECT doc_id, text,
            CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS token_count,
            CAST(round((
              0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE))
              + 0.3 * least(1.0, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0)
              + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE))
            ) * 1000000) AS BIGINT) AS quality_micro
          FROM documents
        ),
        kept AS (
          SELECT * FROM scored
          WHERE quality_micro >= 500000 AND token_count BETWEEN 20 AND 2000
        )
        SELECT min(doc_id) AS doc_id,
               arg_max(token_count, -doc_id) AS token_count,
               arg_max(quality_micro, -doc_id) AS quality_micro
        FROM kept GROUP BY md5(text)
    """,
    "dedup_exact": f"""
        WITH corpus AS ({_DUP_CORPUS})
        SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keeper
        FROM corpus GROUP BY md5(text) HAVING count(*) > 1
    """,
    "dedup_minhash_candidates": f"{_BANDS} SELECT doc_a, doc_b FROM cand",
    "dedup_jaccard": f"""
        {_BANDS},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b,
               CAST(round(n_inter * 1000000 / (sa.n + sb.n - n_inter)) AS BIGINT) AS jaccard_micro
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(round(n_inter * 1000000 / (sa.n + sb.n - n_inter)) AS BIGINT) >= 800000
    """,
    "dedup_simhash": f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        h AS (SELECT doc_id, md5(token) AS h FROM tok),
        votes AS (SELECT doc_id, {_SIMHASH_VOTES} FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({_SIMHASH_PACK} AS BIGINT) AS simhash FROM votes
    """,
    "ann_lsh_topk": _lsh_topk_sql(),
    "ann_incremental_topk": _incr_ann_sql(),
    "embed_documents": _embed_sql(),
    "ann_cosine_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(list_dot_product(CAST(embedding AS DOUBLE[]), q.qe) * 1000000) AS BIGINT)
                 AS dot_micro
        FROM embeddings, q
        ORDER BY dot_micro DESC, vec_id ASC
        LIMIT 10
    """,
    "filter_limit": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE lang = 'en' ORDER BY doc_id LIMIT 100
    """,
    "lookup_join": """
        SELECT d.lang AS doc_lang, count(*) AS n,
               CAST(round(sum(e.value) * 100) AS BIGINT) AS sum_cents
        FROM events e JOIN documents d ON e.user_id = d.doc_id
        GROUP BY d.lang
    """,
    "orders_topk": """
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "table_counts": """
        SELECT 'documents' AS tbl, count(*) AS n FROM documents
        UNION ALL
        SELECT 'events' AS tbl, count(*) AS n FROM events
    """,
}
