"""Source connectors: webhook JSON ingestion, paginated REST fetch."""
