"""Pure kernel library (SURVEY.md §7 step 3).

Every function here is deterministic, side-effect free and importable both by
the Ray pipeline UDFs and by the single-threaded reference-semantics oracle
(`kgray.oracle`) — that shared-source-of-truth is what makes the byte-identity
and P/R invariants hold by construction.
"""
