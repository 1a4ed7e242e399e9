"""Shared utilities: structured logging, image IO."""
