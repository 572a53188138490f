"""Sources: nested-JSON / GeoJSON / two-header-CSV / GTFS readers (SURVEY §2.1)."""
