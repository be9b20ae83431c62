"""HTML wrap / extract kernels for the Common-Crawl-style page table.

The input_hint table carries ``html: binary`` alongside ``text: string``
with the contract that ``text`` is the extracted main content of ``html``
(the north-star invariant: byte-identical extracted text per url through
every stage). This module makes that relationship real in BOTH directions:

- :func:`wrap_html` renders a deterministic single-line page around the
  text — head (title/meta/script/style), nav + footer boilerplate with
  links and entities, and the content wrapped in ``<div class="c"><p>`` —
  so the synthesized corpus has the structure a real extraction has to
  fight through (script/style payloads, boilerplate links, escaping).
- :func:`extract_text` is the extraction pipeline (the engine-side
  analogue of the reference's text-preserving IO boundary): drop
  head/script/style, drop nav/footer boilerplate, strip remaining tags,
  unescape entities, normalize whitespace. Applied to :func:`wrap_html`
  output it recovers ``text`` byte-identically; the driver oracle mirrors
  every step in DuckDB (same RE2 regex engine) via :func:`extract_sql`.

Every kernel is pure ``pyarrow.compute`` (RE2 ``replace_substring_regex``
and vectorized literal replaces) — zero Python objects per row, zero-copy
in from the object store — so the extraction stage streams at the same
cost class as the geocode/fingerprint stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# boilerplate-block removal patterns: applied in order, each non-greedy so
# RE2 (shared by pyarrow and DuckDB) gives identical spans on both sides.
# \b keeps <head> from eating <header> and <nav> from eating <navigation>.
_BLOCK_PATTERNS = (
    r"<script\b[^>]*>.*?</script>",
    r"<style\b[^>]*>.*?</style>",
    r"<head\b[^>]*>.*?</head>",
    r"<nav\b[^>]*>.*?</nav>",
    r"<footer\b[^>]*>.*?</footer>",
)
_TAG_PATTERN = r"<[^>]*>"
_WS_PATTERN = r"[ \t\r\n]+"
_WS_CHARS = " \t\r\n"

# entity tables. Escape order: & first (else it re-escapes the entities we
# just wrote); unescape order: &amp; LAST (else "&amp;lt;" would over-decode).
_ESCAPES = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"))
_UNESCAPES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
              ("&#39;", "'"), ("&amp;", "&"))


def escape_text(text: pa.Array | pa.ChunkedArray):
    """HTML-escape a string column (vectorized literal replaces)."""
    out = text
    for lit, ent in _ESCAPES:
        out = pc.replace_substring(out, lit, ent)
    return out


def wrap_html(text, id_str) -> pa.Array:
    """Render the deterministic page template around ``text`` → binary.

    ``id_str`` is the page's id as a string column (doc_id / row index);
    it appears in the title and in the tracking script so head-stripping
    is load-bearing (a naive tag-strip would leak it into the content).
    """
    esc = escape_text(text)
    s = pc.binary_join_element_wise(
        pa.scalar('<html><head><title>doc '), id_str,
        pa.scalar('</title><meta charset="utf-8"><script type="text/javascript">var docId='),
        id_str,
        pa.scalar(';track(docId);</script><style>.c{font-size:12px}</style></head>'
                  '<body><nav><a href="/">home</a> <a href="/crawl">crawl</a></nav>'
                  '<div class="c"><p>'),
        esc,
        pa.scalar('</p></div><footer><a href="/terms">&copy; 2026 crawl.example</a>'
                  '</footer></body></html>'),
        "",
    )
    return pc.cast(s, pa.binary())


def strip_blocks(html_str):
    """Remove script/style/head/nav/footer blocks (string column in/out)."""
    out = html_str
    for pat in _BLOCK_PATTERNS:
        out = pc.replace_substring_regex(out, pat, "")
    return out


def extract_text(html) -> pa.Array:
    """html binary column → extracted main-content text (string column).

    Pipeline: utf-8 decode → drop boilerplate blocks → tags→space →
    entity unescape → whitespace collapse → trim. On :func:`wrap_html`
    pages the result equals the original ``text`` byte-for-byte.
    """
    s = pc.cast(html, pa.string())
    s = strip_blocks(s)
    s = pc.replace_substring_regex(s, _TAG_PATTERN, " ")
    for ent, lit in _UNESCAPES:
        s = pc.replace_substring(s, ent, lit)
    s = pc.replace_substring_regex(s, _WS_PATTERN, " ")
    return pc.utf8_trim(s, _WS_CHARS)


# --- DuckDB mirrors (same RE2 engine, same operation order) ---------------

def wrap_sql(text_expr: str, id_expr: str) -> str:
    """SQL expression rendering the same template from (text, id)."""
    esc = text_expr
    for lit, ent in _ESCAPES:
        esc = f"replace({esc}, '{lit}', '{ent}')"
    return (
        "'<html><head><title>doc ' || " + id_expr +
        " || '</title><meta charset=\"utf-8\"><script type=\"text/javascript\">var docId=' || "
        + id_expr +
        " || ';track(docId);</script><style>.c{font-size:12px}</style></head>"
        "<body><nav><a href=\"/\">home</a> <a href=\"/crawl\">crawl</a></nav>"
        "<div class=\"c\"><p>' || " + esc +
        " || '</p></div><footer><a href=\"/terms\">&copy; 2026 crawl.example</a>"
        "</footer></body></html>'"
    )


def extract_sql(html_expr: str) -> str:
    """SQL expression mirroring :func:`extract_text` step-for-step."""
    s = html_expr
    for pat in _BLOCK_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    s = f"regexp_replace({s}, '{_TAG_PATTERN}', ' ', 'g')"
    for ent, lit in _UNESCAPES:
        sql_lit = lit.replace("'", "''")
        s = f"replace({s}, '{ent}', '{sql_lit}')"
    s = f"regexp_replace({s}, '{_WS_PATTERN}', ' ', 'g')"
    return f"trim({s}, ' ' || chr(9) || chr(13) || chr(10))"
