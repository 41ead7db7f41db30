"""Persistent state: segment format, manifests, resumable layout."""
