"""The web-text quality pipeline: language-ID + Gopher/C4-style
heuristic rules + PII/toxicity scrub over Common-Crawl-style pages
(url, warc_ts, html, text, lang) — the north-rule generalization of the
reference's validation suite."""
