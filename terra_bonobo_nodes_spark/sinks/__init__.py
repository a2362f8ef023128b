"""Sinks: upsert layer store, retention, bulk export, logging (SURVEY §2.2)."""
