"""End-to-end pipelines: SEG-Y -> store ingestion, store -> SEG-Y export."""
