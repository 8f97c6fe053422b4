"""Graph sources: Parquet (primary) and the reference's text formats."""
