"""Streaming parity layer (SURVEY.md §2.6, §3 EP3, build plan M8)."""

from .parity import run_stream_over_batch, stream_from_batch
from .pipeline import PipelineRunner

__all__ = ["run_stream_over_batch", "stream_from_batch", "PipelineRunner"]
