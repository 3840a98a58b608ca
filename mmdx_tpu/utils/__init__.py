"""Shared utilities: pytree helpers, environment info."""
from mmdx_tpu.utils.pytree import count_params, tree_paths, cast_floating  # noqa: F401
