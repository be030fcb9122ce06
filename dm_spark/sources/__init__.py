from dm_spark.sources.relay import read_feed_stream, write_feed_chunks

__all__ = ["read_feed_stream", "write_feed_chunks"]
