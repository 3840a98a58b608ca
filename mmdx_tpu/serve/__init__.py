"""Serving: WSGI app exposing the reference REST API + dev server."""
