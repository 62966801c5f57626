"""Shared utilities: span timing, logging."""
