"""Generic ingest sources (CSV / JSON-lines) — see formats.py."""
