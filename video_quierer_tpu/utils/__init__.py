"""Shared utilities: environment detection, logging, timing."""
