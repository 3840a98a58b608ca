"""Host IO: image decode, object store, feature store."""
