"""Sources: transcript synthesis/derivation, edge-table derivations,
and PGD-compatible edge-list / MatrixMarket readers."""

from pgd_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    derive_transcripts,
    stable_turns,
    transcripts_from_edges,
)
from pgd_ray.sources.edges import edges_from_transcripts, edges_copurchase, tool_vocab
from pgd_ray.sources.io import read_edge_list, read_mtx, read_graph, detect_delimiter

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "derive_transcripts",
    "stable_turns",
    "transcripts_from_edges",
    "edges_from_transcripts",
    "edges_copurchase",
    "tool_vocab",
    "read_edge_list",
    "read_mtx",
    "read_graph",
    "detect_delimiter",
]
