"""Pure-Python/numpy core kernels (no Spark imports).

Everything here is deterministic, per-block/per-document work designed
to run vectorized inside Arrow-batched pandas UDFs. Semantics follow
the reference parser (cited per function as reference file:line).
"""
