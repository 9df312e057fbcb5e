"""Distributed inverted-index build (the half the reference delegates to
Elasticsearch — /root/reference/README.md:3 — implemented natively)."""
