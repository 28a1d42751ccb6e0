"""Lake sources & sinks: partitioned-table read/write, batch ingest,
catalog maintenance, replay — the Spark-native replacement for the
reference's S3/Firehose/DynamoDB/SQS plumbing (SURVEY.md §2a, §3)."""
