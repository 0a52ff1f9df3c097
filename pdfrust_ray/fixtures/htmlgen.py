"""Deterministic HTML fixture documents (see FIXTURES.md §4)."""

from __future__ import annotations


def html_article(uid: str) -> str:
    return f"""<!DOCTYPE html>
<html><head><title>{uid}</title><style>body{{margin:0}}</style>
<script>window.x = 1;</script></head>
<body>
<nav><a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a></nav>
<header><h1>Site header boilerplate</h1></header>
<aside><a href="/ad1">sponsored link one</a> <a href="/ad2">sponsored link two</a></aside>
<article>
<h1>Main headline about {uid}</h1>
<p>The first paragraph of real content for {uid}, long enough to dominate density scoring over the navigation links around it.</p>
<p>A second paragraph keeps the article the densest candidate block in this document.</p>
</article>
<footer>Copyright &amp; legal boilerplate</footer>
</body></html>"""


def html_table(uid: str) -> str:
    return f"""<html><body>
<div id="content">
<p>Inline markup test for {uid}: <b>bold</b>, <i>italic</i>, and <a href="#x">a link</a> inside prose.</p>
<table>
<tr><th>key</th><th>value</th></tr>
<tr><td>alpha {uid}</td><td>1</td></tr>
<tr><td>beta</td><td>2</td></tr>
</table>
<p>Trailing paragraph after the data table.</p>
</div>
</body></html>"""


def html_script(uid: str) -> str:
    return f"""<html><body>
<div>
<script>document.write("should never appear {uid}");</script>
<style>.h {{ display: none }}</style>
<noscript>enable javascript plea</noscript>
<p>Visible content only for {uid}.</p>
</div>
</body></html>"""


def html_entities(uid: str) -> str:
    return f"""<html><body><div>
<p>Entities for {uid}: &amp; &lt; &gt; &#x27; &quot; &nbsp; &eacute; &#8212;</p>
</div></body></html>"""


def html_nested(uid: str) -> str:
    return f"""<html><body>
<div><div><div>
<section>
<p>Deeply nested content for {uid} sits inside several wrapper divs.</p>
<p>Density ties between the wrappers resolve to the outermost scoring node.</p>
</section>
</div></div></div>
<div class="sidebar"><a href="/1">one</a> <a href="/2">two</a></div>
</body></html>"""


def html_malformed(uid: str) -> str:
    return f"""<html><body>
<div>
<p>Unclosed paragraph for {uid}
<b>bold run-on <i>with italics
<p>Second para implicitly closes the first
<td>stray table cell</td>
</div>
<p>after the div</body>"""


HTML_CONSTRUCTS = {
    "html-article": html_article,
    "html-table": html_table,
    "html-script": html_script,
    "html-entities": html_entities,
    "html-nested": html_nested,
    "html-malformed": html_malformed,
}
