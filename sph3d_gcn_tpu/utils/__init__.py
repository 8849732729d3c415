"""Utilities: TF1 checkpoint conversion, logging helpers."""
