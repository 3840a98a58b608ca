"""Data-prep / feature / training / inference pipelines."""
