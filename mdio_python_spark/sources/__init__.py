"""Sources & sinks: driver-table loaders, SEG-Y DataSource, chunked store."""
