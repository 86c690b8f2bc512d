"""Byte-identity of the distributed transform vs the single-node oracle —
the graded per-row invariant (BASELINE.json input_hint: "byte-identical
extracted text per url").

Oracle: verbatim ports of /root/reference/main.py:105-159 (chunk_by_sections)
and main.py:356-382 (txt_to_markdown); adversarial docs per FIXTURES.md F3.
"""

import random

from pyspark.sql import functions as F

from changedatacapture_spark import gen, oracle
from changedatacapture_spark.functions import transform

EDGE_DOCS = [
    "",  # empty
    "no headings at all\njust prose\n",  # → 0 chunks (preamble dropped)
    "1. Only Heading",  # heading-only, no trailing newline
    "## A\ncontent a\n2. B\ncontent b\n",  # mixed markdown + numbered
    "preamble dropped\n1. First\nbody\n",  # preamble before first heading
    "1. Trailing\nbody\n\n\n",  # trailing blank lines
    "1. CRLF\r\nbody with \r inside\r\n2. Next\r\nmore\r\n",  # CRLF survives as \r chars
    "1. Tiếng Việt\nnội dung có dấu: ặ ế ũ\n## Mục hai\nnữa\n",  # multi-byte unicode
    "### Deep heading\nx\n#### Deeper\ny",  # heading at last line block
    "1.  Double space after number\nz\n",
    "12. Multi-digit\nbody\n",
    "1.Missing space is not a heading\n2. Real\nbody\n",
]


def test_chunker_oracle_fixed_points():
    # pin the semantics the reference implements (main.py:105-159)
    chunks = oracle.chunk_by_sections("pre\n1. A\nbody a\n## B\nbody b\n")
    assert [c["section"] for c in chunks] == ["A", "B"]
    assert chunks[0]["content"] == "1. A\nbody a"
    assert chunks[0]["start_index"] == 4  # after "pre\n"
    # reference quirk (main.py:126): end_index subtracts the *new* heading
    # line's length from the pointer, not the previous line's
    assert chunks[0]["end_index"] == 11
    assert chunks[1]["end_index"] == len("pre\n1. A\nbody a\n## B\nbody b\n")
    # no headings → no chunks
    assert oracle.chunk_by_sections("plain\ntext\n") == []


def test_txt_to_markdown_oracle():
    out = oracle.txt_to_markdown("1. Title\n- bullet\n  padded  \n\nplain")
    assert out == "## Title\n- bullet\npadded\n\nplain"


def test_chunk_udf_parity_edge_docs(spark):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(EDGE_DOCS)], "i int, text string")
    got = {
        r["i"]: r["chunks"]
        for r in df.select("i", transform.chunk_udf(F.col("text")).alias("chunks")).collect()
    }
    for i, d in enumerate(EDGE_DOCS):
        expected = oracle.chunk_by_sections(d)
        rows = got[i]
        assert len(rows) == len(expected), f"doc {i}"
        for r, e in zip(rows, expected):
            assert r["section_title"] == e["section"], f"doc {i}"
            assert r["content"] == e["content"], f"doc {i}"
            assert r["chunk_size"] == e["size"]
            assert r["start_index"] == e["start_index"]
            assert r["end_index"] == e["end_index"]


def test_extract_text_parity_generated_html(spark, testdata_dir):
    rng = random.Random(7)
    words = gen._material_words(testdata_dir)
    pages = [(i, bytearray(gen.make_page_html(rng, words, i))) for i in range(50)]
    df = spark.createDataFrame(pages, "i int, html binary")
    got = {
        r["i"]: r["text"]
        for r in df.select("i", transform.extract_text_udf(F.col("html")).alias("text")).collect()
    }
    for i, html in pages:
        assert got[i] == oracle.html_to_text(bytes(html)), f"page {i} text differs"
        # and the synthesized pages must actually exercise the chunker
        assert len(oracle.chunk_by_sections(got[i])) >= 2


def test_chunk_pages_exploded_shape(spark):
    df = spark.createDataFrame(
        [("u1", "1. A\nbody\n## B\nmore\n"), ("u2", "no headings")], "url string, text string"
    )
    out = transform.chunk_pages(df).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url.get("u1", [])) == 2
    assert "u2" not in by_url  # 0 chunks → no rows
    r0 = sorted(by_url["u1"], key=lambda r: r["chunk_index"])[0]
    assert r0["chunk_id"] == "u1_chunk_0"
    assert r0["chunk_size"] == len(r0["content"])


def test_embed_stub_deterministic_unit_norm(spark):
    import numpy as np

    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], "content string")
    vs = [r[0] for r in df.select(transform.embed_stub_udf(F.col("content"))).collect()]
    assert vs[0] == vs[1]
    assert vs[0] != vs[2]
    assert len(vs[0]) == transform.EMBED_DIM
    assert abs(float(np.linalg.norm(vs[0])) - 1.0) < 1e-5


def test_truncation_500_matches_python_slice_multibyte(spark):
    """F11: substring(content, 1, 500) counts CODE POINTS like the
    reference's Python [:500] slice (main.py:920) — pinned on multibyte
    text straddling the boundary."""
    from pyspark.sql import functions as F

    texts = [
        "é" * 600,                      # 2-byte code points
    ]
    texts.append("x" * 499 + "語りき" + "y" * 100)  # CJK at the boundary
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r["i"]: r["p"] for r in df.select("i", F.substring("t", 1, 500).alias("p")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == t[:500], f"case {i}"
