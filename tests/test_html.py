"""HTML -> text extraction (cleaning.html_to_text): known-answer cases,
entity-order semantics, plain-text idempotence, DuckDB chain parity, and
the zero-shuffle plan guarantee."""

import duckdb
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.cleaning import html_passes_sql, html_to_text


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    return html_to_text(df).collect()[0]["text_plain"]


def test_known_answer(spark):
    html = ('<html><head><STYLE a=b>x{}</style><script src="x">var a=1;'
            "</script></head><body><h1>Title</h1><p>Hello &amp;lt; "
            "<b>world</b>&nbsp;&#39;q&#39;</p><!-- c --><div>Line2</div>"
            "</body></html>")
    assert _extract(spark, html) == "Title\nHello &lt; world 'q'\nLine2"


def test_entity_decode_order(spark):
    # &amp; decodes LAST: escaped markup stays text, never becomes a tag
    assert _extract(spark, "a &amp;amp; b &amp;lt;i&amp;gt;") == (
        "a &amp; b &lt;i&gt;"
    )
    assert _extract(spark, "&lt;script&gt;x&lt;/script&gt;") == (
        "<script>x</script>"
    )


def test_block_closers_become_newlines(spark):
    html = "<ul><li>one</li><li>two</li></ul><table><tr><td>c</td></tr></table>"
    assert _extract(spark, html) == "one\ntwo\nc"


def test_plain_text_is_untouched(spark):
    plain = "no markup here, just text with 3 < 4 ... sort of"
    # the bare '<' starts a '<[^>]*>' candidate only if a '>' follows;
    # none does, so the text survives
    assert _extract(spark, plain) == plain
    # idempotence: a second pass changes nothing
    assert _extract(spark, _extract(spark, plain)) == plain


def test_multiline_script_and_comment_stripped(spark):
    html = "before<script>\nline1\nline2\n</script>\n<!--\nhidden\n-->after"
    assert _extract(spark, html) == "before\nafter"


def test_whitespace_normalization(spark):
    html = "<p>a   b</p>\n\n\n<p>c\t\td</p>"
    assert _extract(spark, html) == "a b\nc d"


def test_duckdb_chain_parity(spark):
    cases = [
        "<div>x &quot;y&quot;<br>z</div>",
        "plain",
        "<script>while(1){}</script>tail",
        "a<b>b</b>c &nbsp; &#39;d&#39;",
        "",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text_plain"]
           for r in html_to_text(df).collect()}
    con = duckdb.connect()
    for i, c in enumerate(cases):
        sql = "SELECT " + html_passes_sql("'" + c.replace("'", "''") + "'")
        assert got[i] == con.execute(sql).fetchone()[0], c


def test_single_scan_no_exchange(spark):
    from entitylinking_spark.sources.tables import is_exchange_free

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, text string")
    assert is_exchange_free(html_to_text(df))


def test_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert html_to_text(df).collect()[0]["text_plain"] is None
