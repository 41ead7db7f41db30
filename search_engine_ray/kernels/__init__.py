"""Pure-Python exact-semantics kernels (no Ray).

These reproduce the reference engine's observable behavior byte-for-byte /
bit-for-bit; conformance is pinned by tests that compile the reference C++
(tests/tools/*.cpp) and diff outputs.
"""
