"""Sources: seed scans, fixture world materialization, fetchers."""
