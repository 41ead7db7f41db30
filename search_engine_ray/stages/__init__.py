"""Ray Data batch transforms (Arrow in / Arrow out)."""
