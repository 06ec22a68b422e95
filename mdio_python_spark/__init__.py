"""mdio_python_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TGSAI/mdio-python (reference @ /root/reference).

This is NOT a port of the reference's xarray/dask/zarr execution engine. The
reference's core competency — a bidirectional pivot between a flat trace table
(SEG-Y) and a dense N-D labeled array (Zarr) — is re-expressed here as
idiomatic Spark DataFrame plans:

- trace table            -> long-format DataFrame (one row per trace)
- grid build / binning   -> broadcast dim-table joins / dense_rank windows
- chunked N-D array sink -> Parquet partitioned by chunk keys + JSON manifest
- masked export          -> filter + repartitionByRange ordered flatten
- summary statistics     -> df.agg with automatic partial/final aggregation

Subpackages
-----------
schemas     declared (never inferred) data model: dtypes, dimensions,
            variables, datasets, templates, grid overrides
sources     table loaders, the SEG-Y DataSource, the chunked store sink
operators   grid assignment, index strategies, geometry detectors, stats,
            dedup / similarity / text-analysis (LLM-pipeline extensions)
functions   scalar functions (coordinate scalar, normalizers, hashes)
plans       the query registry consumed by __spark_entry__ / bench.py
streaming   structured-streaming ingestion (beyond-reference surface)
"""

__version__ = "0.1.0"
