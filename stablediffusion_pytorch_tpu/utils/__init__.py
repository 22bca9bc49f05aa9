"""Conditioning, config-validation, and run-artifact utilities."""
