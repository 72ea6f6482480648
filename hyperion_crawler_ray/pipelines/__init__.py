"""End-to-end pipelines: the frontier crawl loop (distributed), its
single-threaded oracle twin, the reference-shaped market-data transform,
and the driver-facing query registry."""
