"""Structured Streaming: warc_ts-ordered page replay + windowed aggs."""
