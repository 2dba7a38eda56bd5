"""Problem file ingestion."""

from .mps import read_mps

__all__ = ["read_mps"]
