"""Sources & sinks: snapshot catalog (Iceberg-style) + parquet IO."""
