"""Checkpointing: native bundle format, orbax save/restore, torch importer."""
