from .ingest import incremental_file_ingest, stream_snapshot

__all__ = ["incremental_file_ingest", "stream_snapshot"]
