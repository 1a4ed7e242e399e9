"""Verification pipeline: artifact store, stages, reports, restore."""

from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore

__all__ = ["ArtifactStore"]
