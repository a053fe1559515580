"""Structured Streaming twins of the batch event queries (SURVEY.md §2.9
st4-st7, D-tier): watermarks, stream dedup, custom per-key state, output
modes.  Validated by tests/test_streaming.py against the batch goldens."""
