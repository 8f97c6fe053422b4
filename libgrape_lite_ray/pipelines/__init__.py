"""End-to-end pipelines: web (pages -> graph -> analytics) and the
TPC-H-testdata-derived graph used by the driver's correctness harness."""
