"""Reader-chain parsers (SURVEY.md §2.2): batch analogs of the
libbeat/reader decorator chain (multiline, ndjson, container, lines)."""
