from .chunking import chunk_files, chunk_binary_column
from .funnels import cohort_retention, funnel_steps, transition_counts
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
    "funnel_steps",
    "cohort_retention",
    "transition_counts",
]
