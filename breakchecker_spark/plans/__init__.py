"""Crawl orchestration: round loop, checkpoint store, reporting."""
