"""Sources & sinks: bronze JSONL lake, Kafka wrappers, synthetic
event generator, medallion (bronze -> silver -> gold) batch jobs."""
