from .chunking import chunk_files, chunk_binary_column
from .assembly import (
    dedup_chunks,
    pick_latest_generation,
    assemble_files,
)

__all__ = [
    "chunk_files",
    "chunk_binary_column",
    "dedup_chunks",
    "pick_latest_generation",
    "assemble_files",
]
