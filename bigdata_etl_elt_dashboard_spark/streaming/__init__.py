"""Structured Streaming over the `events` table (SURVEY §2.12, §7.5)."""
