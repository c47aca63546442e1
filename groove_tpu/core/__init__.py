"""Core value types and musical time."""
