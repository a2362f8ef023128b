"""Sources: CSV / GeoJSON / zip / binary / SQL scans (SURVEY.md §2.1)."""
