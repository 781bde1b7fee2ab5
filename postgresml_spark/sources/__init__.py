"""Sources/sinks: dataset loaders, collection storage."""
