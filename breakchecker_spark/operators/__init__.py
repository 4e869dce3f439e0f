"""Distributed operators: URL-seen set, politeness, extraction,
breach join, dedup suites, similarity search, text analysis."""
