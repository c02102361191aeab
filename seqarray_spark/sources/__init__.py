"""Sources & sinks: VCF reader/writer, parquet dataset layout, and the
driver-testdata adapters."""
