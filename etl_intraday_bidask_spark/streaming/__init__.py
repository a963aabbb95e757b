"""Structured Streaming twins of the event-time operators."""
