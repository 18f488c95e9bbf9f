"""Input-source connectors (web-archive ingestion)."""
