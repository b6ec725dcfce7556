from .assembly import streaming_assemble
from .sources import file_chunk_stream, kafka_chunk_stream
from .sinks import write_reconstructed_files, reconstruction_sink

__all__ = [
    "streaming_assemble",
    "file_chunk_stream",
    "kafka_chunk_stream",
    "write_reconstructed_files",
    "reconstruction_sink",
]
